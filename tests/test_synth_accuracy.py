"""Quantified accuracy signal on learnable synthetic data (VERDICT r1
item 10): the full loss/assigner/NMS/metrics loop must demonstrably learn.

The CI proxy trains EMS-Res10 for 6 epochs on 96 synthetic images and
requires best mAP50 >= 0.25 — the measured trajectory reaches 0.31-0.38 by
epoch 3-5 (scripts/synth_accuracy.py; 30 epochs ~0.77-0.87, 50 epochs
0.93, recorded in BASELINE.md), so the margin covers CI noise.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_synth_detection_accuracy(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.synth_accuracy import make_data
    from ecs_yolo_tpu.train.driver import train

    root = make_data(tmp_path / "data", size=64)
    state, best_fit, history = train(
        cfg="resnet10.yaml",
        train_path=str(root / "train" / "images"),
        val_path=str(root / "val" / "images"),
        nc=2,
        epochs=6,
        batch_size=8,
        nbs=8,
        imgsz=64,
        max_labels=8,
        patience=6,
        val_every=2,
        save_dir=str(tmp_path / "exp"),
        hyp=dict(mosaic=0.0, mixup=0.0, fliplr=0.5, translate=0.1,
                 scale=0.3, warmup_epochs=3.0, lr0=0.01),
        autoanchor=True,
        workers=2,
    )
    best50 = max(h.get("map50", 0.0) for h in history)
    assert np.isfinite(best_fit)
    assert best50 >= 0.25, f"mAP50 {best50:.3f} below the learnability bar"
