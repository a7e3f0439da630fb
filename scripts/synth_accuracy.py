"""Quantified accuracy signal on synthetic data (VERDICT r1 item 10).

Trains EMS-Res10 (T=2) on a learnable synthetic detection set (bright
rectangles over noise, 2 classes distinguished by color) and reports val
mAP50 — the full loss/assigner/NMS/metrics loop validated quantitatively.
Target: mAP50 >= 0.8.  No real datasets exist in this image (BASELINE.md);
this is the strongest available accuracy proxy.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

# default: CPU (tests / local iteration).  SYNTH_PLATFORM=axon runs the
# convergence ON the TPU (VERDICT r4 item 8 re-anchoring).
jax.config.update("jax_platforms", os.environ.get("SYNTH_PLATFORM", "cpu"))

import numpy as np
from PIL import Image


def make_data(root: Path, n_train=96, n_val=24, size=96, seed=0):
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split / "images").mkdir(parents=True, exist_ok=True)
        (root / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.rand(size, size, 3) * 60).astype(np.uint8)
            rows = []
            for _ in range(rng.randint(1, 3)):
                cls = rng.randint(2)
                w, h = rng.uniform(0.25, 0.45, 2)
                cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
                cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
                x1, y1 = int((cx - w / 2) * size), int((cy - h / 2) * size)
                x2, y2 = int((cx + w / 2) * size), int((cy + h / 2) * size)
                color = [230, 40, 40] if cls == 0 else [40, 230, 40]
                img[y1:y2, x1:x2] = color
                rows.append(f"{cls} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
            Image.fromarray(img).save(root / split / "images" / f"{i}.jpg")
            (root / split / "labels" / f"{i}.txt").write_text(
                "\n".join(rows) + "\n")
    return root


def main(epochs=40, imgsz=64, opt="SGD", lr0=0.005):
    import tempfile

    from ecs_yolo_tpu.train.driver import train

    root = make_data(Path(tempfile.mkdtemp(prefix="synth_acc_")), size=imgsz)
    t0 = time.time()
    state, best_fit, history = train(
        cfg="resnet10.yaml",
        train_path=str(root / "train" / "images"),
        val_path=str(root / "val" / "images"),
        nc=2,
        epochs=epochs,
        batch_size=8,
        nbs=8,  # no grad accumulation: 12 optimizer applies per epoch on
        # this 96-image set (nbs=64 would leave the LR in warmup for ~15
        # epochs and starve the run)
        imgsz=imgsz,
        optimizer=opt,
        max_labels=8,
        patience=epochs,
        val_every=2,
        save_dir=str(root / "exp"),
        hyp=dict(mosaic=0.0, mixup=0.0, fliplr=0.5, translate=0.1,
                 scale=0.3, warmup_epochs=3.0, lr0=lr0),
        autoanchor=True,
    )
    best50 = max(h.get("map50", 0.0) for h in history)
    curve = [round(h.get("map50", 0.0), 3) for h in history]
    print(f"mAP50 curve (per epoch, val_every=2): {curve}")
    print(f"best fitness={best_fit:.4f} best mAP50={best50:.4f} "
          f"({time.time() - t0:.0f}s, {epochs} epochs, {opt} lr0={lr0})")


if __name__ == "__main__":
    main(
        epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 40,
        opt=sys.argv[2] if len(sys.argv) > 2 else "SGD",
        lr0=float(sys.argv[3]) if len(sys.argv) > 3 else 0.005,
    )
