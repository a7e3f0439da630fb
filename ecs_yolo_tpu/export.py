"""Model export (reference export.py / export2.py).

Format matrix vs the reference (export2.py:34-443):

| reference format  | here                                            |
|-------------------|--------------------------------------------------|
| torchscript       | StableHLO text (the JAX-native serialized graph) |
| ONNX              | gated: needs `onnx` (absent in this image)       |
| TF SavedModel     | jax2tf -> tf.saved_model                         |
| TFLite (+fp16)    | TFLiteConverter on the jax2tf function           |
| CoreML/TRT/...    | out of scope for TPU serving (documented gap)    |
| orbax             | native checkpoint (this framework's .pt analog)  |

Unlike the reference's models/tf.py — a hand-written Keras mirror that does
NOT cover the SNN blocks (SURVEY §3.5) — jax2tf exports the *actual* model,
spiking blocks included.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .utils.general import LOGGER


def export_formats():
    """Supported export formats (reference export2.py `export_formats`)."""
    return {
        "stablehlo": "StableHLO MLIR text",
        "saved_model": "TensorFlow SavedModel (via jax2tf)",
        "tflite": "TFLite flatbuffer (via jax2tf + TFLiteConverter)",
        "orbax": "orbax checkpoint (native)",
    }


def _forward_fn(model, variables):
    def forward(images):
        out = model.module.apply(variables, images, training=False)
        if model.head_name in ("v10Detect", "ASFF_v10Detect"):
            return out.one2one[0]
        return out[0]

    return forward


def export_stablehlo(model, variables, path, imgsz: int = 640, batch: int = 1):
    """Serialize the lowered StableHLO module (JAX-native 'torchscript')."""
    fwd = _forward_fn(model, variables)
    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(x)
    text = lowered.as_text()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)
    LOGGER.info(f"export: StableHLO -> {path} ({len(text)/1e6:.1f} MB)")
    return path


def export_saved_model(model, variables, path, imgsz: int = 640, batch: int = 1):
    """TF SavedModel via jax2tf (reference export_saved_model)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    fwd = _forward_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32, name="images")
        ],
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, str(path))
    LOGGER.info(f"export: SavedModel -> {path}")
    return Path(path)


def export_tflite(
    model, variables, path, imgsz: int = 640, batch: int = 1, fp16: bool = False
):
    """TFLite flatbuffer (reference export_tflite)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    fwd = _forward_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32, name="images")
        ],
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if fp16:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    blob = converter.convert()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    LOGGER.info(f"export: TFLite -> {path} ({len(blob)/1e6:.1f} MB)")
    return path


def run(
    model,
    variables,
    include: Sequence[str] = ("stablehlo",),
    out_dir="runs/export",
    imgsz: int = 640,
    batch: int = 1,
):
    """Export to the requested formats (reference export.py run())."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = {}
    for fmt in include:
        if fmt == "stablehlo":
            results[fmt] = export_stablehlo(
                model, variables, out_dir / "model.stablehlo.mlir", imgsz, batch
            )
        elif fmt == "saved_model":
            results[fmt] = export_saved_model(
                model, variables, out_dir / "saved_model", imgsz, batch
            )
        elif fmt == "tflite":
            results[fmt] = export_tflite(
                model, variables, out_dir / "model.tflite", imgsz, batch
            )
        elif fmt == "orbax":
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(
                    (out_dir / "orbax").resolve(),
                    jax.device_get(variables),
                    force=True,
                )
            results[fmt] = out_dir / "orbax"
        else:
            raise KeyError(f"unknown export format {fmt!r}; "
                           f"supported: {list(export_formats())}")
    return results
