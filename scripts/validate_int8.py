"""int8 PTQ accuracy validation (VERDICT r3 item 6).

Trains EMS-Res10 on the learnable synthetic set (scripts/synth_accuracy.py
recipe), exports fp32 and int8-PTQ TFLite artifacts (calibrated on the
train images — reference export.py:214-253 int8 calibration intent), and
runs the SAME val split through all three paths via
``backends.DetectMultiBackend`` + ``val.run``:

    native JAX  vs  fp32 TFLite  vs  int8 TFLite

Prints one JSON line with the mAP50s and deltas; the measured numbers are
recorded in BASELINE.md §6.  CPU-only (tflite has no TPU runtime here).

Usage: python scripts/validate_int8.py [epochs]
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from synth_accuracy import make_data  # noqa: E402 (same scripts dir)


def main(epochs: int = 15, imgsz: int = 64):
    from ecs_yolo_tpu import val as val_mod
    from ecs_yolo_tpu.backends import DetectMultiBackend
    from ecs_yolo_tpu.data.dataset import Dataset
    from ecs_yolo_tpu.export import export_tflite
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.train.driver import train

    root = make_data(Path(tempfile.mkdtemp(prefix="int8_val_")), size=imgsz)
    state, best_fit, history = train(
        cfg="resnet10.yaml",
        train_path=str(root / "train" / "images"),
        val_path=str(root / "val" / "images"),
        nc=2, epochs=epochs, batch_size=8, nbs=8, imgsz=imgsz,
        max_labels=8, patience=epochs, val_every=2,
        save_dir=str(root / "exp"),
        hyp=dict(mosaic=0.0, mixup=0.0, fliplr=0.5, translate=0.1,
                 scale=0.3, warmup_epochs=3.0, lr0=0.01),
        autoanchor=True, workers=2,
    )

    model = build_model("resnet10.yaml", nc=2)
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}
    batch = 8

    fp_path = export_tflite(model, variables, root / "exp" / "model.tflite",
                            imgsz=imgsz, batch=batch)
    int8_path = export_tflite(
        model, variables, root / "exp" / "model_int8.tflite",
        imgsz=imgsz, batch=batch, int8=True,
        calib_data=str(root / "train" / "images"),
    )

    def evaluate(m, v):
        ds = Dataset(str(root / "val" / "images"), img_size=imgsz,
                     augment=False, max_labels=8)
        r = val_mod.run(m, v, None, imgsz=imgsz, batch_size=batch,
                        dataset=ds, workers=0)
        return float(r["map50"])

    native = evaluate(model, variables)
    results = {"native_map50": round(native, 4)}
    for name, p in (("fp32_tflite", fp_path), ("int8_tflite", int8_path)):
        be = DetectMultiBackend(Path(p), cfg="resnet10.yaml", nc=2)
        m50 = evaluate(be, None)
        results[f"{name}_map50"] = round(m50, 4)
        results[f"{name}_delta"] = round(m50 - native, 4)
    results["train_best_fitness"] = round(float(best_fit), 4)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
