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

import json
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


def _portable(model):
    """Rebuild without TPU-layout tricks for portable-runtime exports.

    ``SNNConfig.packed_c64`` packs conv kernels at trace time via
    scatter-adds (snn/packed_spread.py) — a pure TPU-layout optimization
    over canonical, layout-agnostic parameters.  TFLite's runtime rejects
    those stablehlo.scatter configurations, so TF-targeted exports rebuild
    the same cfg with packing off; the variables tree is identical.
    """
    if not getattr(model, "snn", None) or not model.snn.packed_c64:
        return model
    import dataclasses

    from .models.yolo import build_model

    return build_model(
        model.cfg, snn=dataclasses.replace(model.snn, packed_c64=False)
    )


def _representative_dataset(calib_data, imgsz: int, batch: int, n: int = 100):
    """Calibration-sample generator for int8 post-training quantization.

    Mirrors the reference's representative dataset built from ``LoadImages``
    over a calibration directory (reference export.py export_tflite int8
    branch); with no directory given, falls back to uniform noise in [0,1]
    (documented: activation ranges of a spiking net are threshold-bounded,
    so noise calibration is a usable default — NOTE, real images preferred).
    """

    def gen():
        count = 0
        if calib_data:
            from .data.loaders import LoadImages

            for _, img, _, _ in LoadImages(calib_data, img_size=imgsz):
                x = img[None].astype(np.float32)
                if x.shape[0] != batch:
                    x = np.repeat(x, batch, axis=0)[:batch]
                yield [x]
                count += 1
                if count >= n:
                    return
        rng = np.random.RandomState(0)
        while count < n:
            yield [rng.rand(batch, imgsz, imgsz, 3).astype(np.float32)]
            count += 1

    return gen


def export_tflite(
    model, variables, path, imgsz: int = 640, batch: int = 1,
    fp16: bool = False, int8: bool = False, calib_data=None,
):
    """TFLite flatbuffer (reference export_tflite).

    ``int8=True`` runs post-training quantization with a representative
    dataset (reference export.py int8 branch: 100 calibration images via
    LoadImages).  Full-integer conversion (uint8 I/O, TFLITE_BUILTINS_INT8)
    is attempted first — the unrolled SNN graph is pure conv/elementwise so
    it usually quantizes end to end; if the converter rejects an op, falls
    back to hybrid dynamic-range weight quantization (no calibration pass,
    float I/O, SELECT_TF_OPS allowed) and logs the downgrade.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    model = _portable(model)
    fwd = _forward_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32, name="images")
        ],
    )

    def make_converter():
        c = tf.lite.TFLiteConverter.from_concrete_functions(
            [tf_fn.get_concrete_function()]
        )
        c.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        return c

    converter = make_converter()
    if fp16:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    if int8:
        rep = _representative_dataset(calib_data, imgsz, batch)
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = rep
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8
        ]
        converter.inference_input_type = tf.uint8
        converter.inference_output_type = tf.uint8
        try:
            blob = converter.convert()
        except Exception as e:  # converter rejects an unquantizable op
            LOGGER.warning(
                f"export: full-int8 TFLite failed ({type(e).__name__}); "
                "falling back to hybrid dynamic-range quantization"
            )
            # Dynamic-range quantization needs no calibration pass, so it
            # avoids the calibrator choking on non-quantizable ops (e.g.
            # stablehlo.scatter from the head's static index updates).
            converter = make_converter()
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            blob = converter.convert()
    else:
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
    int8: bool = False,
    calib_data=None,
    names=None,
):
    """Export to the requested formats (reference export.py run()).

    ``int8``/``calib_data`` apply to the tflite format (reference --int8).

    A ``metadata.json`` sidecar (head name / nc / imgsz / strides / names)
    is written next to the artifacts so :class:`~ecs_yolo_tpu.backends.
    DetectMultiBackend` can run them without the model YAML — the analog of
    the reference embedding a metadata yaml into its TFLite/SavedModel
    exports (reference export.py ``add_tflite_metadata``)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta = {
        "head_name": model.head_name,
        "nc": int(model.nc),
        "imgsz": int(imgsz),
        "batch": int(batch),
        "strides": [float(s) for s in model.strides],
        "names": names,
    }
    (out_dir / "metadata.json").write_text(json.dumps(meta, indent=1))
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
            name = "model-int8.tflite" if int8 else "model.tflite"
            results[fmt] = export_tflite(
                model, variables, out_dir / name, imgsz, batch,
                int8=int8, calib_data=calib_data,
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
