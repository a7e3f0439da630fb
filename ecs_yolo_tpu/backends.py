"""Format-dispatching inference backend.

Equivalent of the reference's ``DetectMultiBackend``
(reference models/common.py:2010+, dispatching PyTorch / TorchScript /
ONNX / TFLite / SavedModel ... by weights suffix).  On this stack the
runtimes that exist are:

| weights                   | backend                                   |
|---------------------------|-------------------------------------------|
| orbax checkpoint dir      | native JAX (``hub.create``)               |
| torch ``.pt``             | native JAX via the torch importer         |
| ``.tflite``               | ``tf.lite.Interpreter``                   |
| SavedModel dir            | ``tf.saved_model.load``                   |

CUDA-side runtimes (TensorRT engines, CoreML, OpenVINO) have no TPU-host
analog and stay out of scope (PARITY.md).  TF-format artifacts carry a
``metadata.json`` sidecar written by :func:`ecs_yolo_tpu.export.run`
(head name / nc / strides / names) — the analog of the metadata yaml the
reference embeds in its exports — so no model YAML is needed to run them.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


def _load_metadata(path: Path) -> dict:
    for cand in (path.parent / "metadata.json", path / "metadata.json"):
        if cand.is_file():
            return json.loads(cand.read_text())
    return {}


class DetectMultiBackend:
    """Run inference from a native checkpoint or an exported artifact.

    ``predict(images)`` takes float32 ``[B, H, W, 3]`` in [0, 1] and
    returns the head's decoded prediction tensor (what ``detect``/``val``
    feed to NMS), as a numpy array.  Exposes ``head_name`` / ``nc`` /
    ``names`` / ``imgsz`` for the NMS/postprocess dispatch.
    """

    def __init__(self, weights, cfg: Optional[str] = None,
                 nc: Optional[int] = None, names=None):
        w = Path(weights)
        meta = _load_metadata(w)
        self.head_name = meta.get("head_name", "Detect")
        self.nc = nc or meta.get("nc")
        self.names = names or meta.get("names")
        self.imgsz = meta.get("imgsz")
        self.format = self._detect_format(w)
        self._init = getattr(self, f"_init_{self.format}")
        self._init(w, cfg)

    @staticmethod
    def _detect_format(w: Path) -> str:
        if w.suffix == ".tflite":
            return "tflite"
        if w.is_dir() and (w / "saved_model.pb").is_file():
            return "saved_model"
        return "native"  # orbax dir or .pt — hub.create dispatches

    # -- native JAX ---------------------------------------------------
    def _init_native(self, w: Path, cfg):
        import jax

        from .hub import create

        if cfg is None:
            raise ValueError("native checkpoints need the model cfg YAML")
        model, variables = create(cfg, str(w), nc=self.nc)
        self.model, self.variables = model, variables
        self.head_name = model.head_name
        self.nc = model.nc

        @jax.jit
        def forward(images):
            out = model.module.apply(variables, images, training=False)
            if self.head_name in ("v10Detect", "ASFF_v10Detect"):
                return out.one2one[0]
            return out[0]

        self._forward = lambda x: np.asarray(forward(x))

    # -- TFLite -------------------------------------------------------
    def _init_tflite(self, w: Path, cfg):
        import tensorflow as tf

        interp = tf.lite.Interpreter(model_path=str(w))
        interp.allocate_tensors()
        self._interp = interp
        self._inp = interp.get_input_details()[0]
        self._out = interp.get_output_details()[0]

        def forward(x):
            x = np.asarray(x, np.float32)
            inp, out = self._inp, self._out
            if inp["dtype"] == np.uint8:  # full-int8 export: quantize I/O
                s, zp = inp["quantization"]
                x = np.clip(np.round(x / s + zp), 0, 255).astype(np.uint8)
            interp.set_tensor(inp["index"], x)
            interp.invoke()
            y = interp.get_tensor(out["index"])
            if out["dtype"] == np.uint8:
                s, zp = out["quantization"]
                y = (y.astype(np.float32) - zp) * s
            return y

        self._forward = forward

    # -- SavedModel ---------------------------------------------------
    def _init_saved_model(self, w: Path, cfg):
        import tensorflow as tf

        loaded = tf.saved_model.load(str(w))
        self._forward = lambda x: np.asarray(
            loaded.f(tf.constant(np.asarray(x, np.float32)))
        )

    def predict(self, images) -> np.ndarray:
        return self._forward(images)

    __call__ = predict
