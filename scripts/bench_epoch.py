"""End-to-end EPOCH throughput on the real chip (VERDICT r3 item 4).

The reference anchor (wandb run-20240512_132647: 823.6 s/epoch, ≤85 img/s)
is a FULL-epoch number — dataloading, augmentation, per-epoch val, logging
and checkpointing included (reference train.py:490-641).  The step-only
numbers in BASELINE.md §5 exclude all of that; this script measures the
same composition the anchor does:

* a synthetic on-disk dataset large enough that loader throughput matters
  (default 2048 train / 256 val images at the bench resolution),
* `train.driver.train` with async workers, per-epoch val, CSV/TB logging
  and checkpointing — the production path, not a stripped loop,
* wall-clock img/s of the epochs AFTER the first (epoch 1 pays the XLA
  compiles), split into train-phase and val-phase time via callbacks.

Compare the printed `epoch_imgs_per_sec` against the step-only
`scripts/bench_train_step.py` rate: the difference is host overhead
(input pipeline + val + logging).

Usage (TPU):   python scripts/bench_epoch.py
Env:  BENCH_CFG/BENCH_NC/BENCH_BATCH/BENCH_IMGSZ/BENCH_N_IMAGES/
      BENCH_EPOCHS/BENCH_WORKERS, BENCH_BF16=1 (default), BENCH_CPU=1
      (debug on host devices).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("BENCH_CPU", "0") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

CFG = os.environ.get("BENCH_CFG", "resnet10.yaml")
NC = int(os.environ.get("BENCH_NC", 13))  # BDD100K classes (the anchor run)
BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", 2048))
N_VAL = int(os.environ.get("BENCH_N_VAL", 256))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", 3))
WORKERS = int(os.environ.get("BENCH_WORKERS", 4))
BF16 = os.environ.get("BENCH_BF16", "1") == "1"
CACHE = os.environ.get("BENCH_CACHE") or None  # ram|disk
DEVAUG = os.environ.get("BENCH_DEVAUG", "0") == "1"
SPC = int(os.environ.get("BENCH_SPC", 1))  # steps per compiled call


def make_data(root: Path, n_train: int, n_val: int, size: int, seed=0):
    """Learnable rectangles-over-noise set (same recipe as
    scripts/synth_accuracy.py, scaled up)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split / "images").mkdir(parents=True, exist_ok=True)
        (root / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.rand(size, size, 3) * 60).astype(np.uint8)
            rows = []
            for _ in range(rng.randint(1, 4)):
                cls = rng.randint(NC)
                w, h = rng.uniform(0.15, 0.4, 2)
                cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
                cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
                x1, y1 = int((cx - w / 2) * size), int((cy - h / 2) * size)
                x2, y2 = int((cx + w / 2) * size), int((cy + h / 2) * size)
                img[y1:y2, x1:x2] = [
                    40 + 180 * (cls % 3 == 0),
                    40 + 180 * (cls % 3 == 1),
                    40 + 180 * (cls % 3 == 2),
                ]
                rows.append(f"{cls} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
            Image.fromarray(img).save(
                root / split / "images" / f"{i}.jpg", quality=85
            )
            (root / split / "labels" / f"{i}.txt").write_text(
                "\n".join(rows) + "\n"
            )
    return root


def main():
    from ecs_yolo_tpu.train.driver import train
    from ecs_yolo_tpu.utils.general import Callbacks

    root = Path(tempfile.mkdtemp(prefix="bench_epoch_"))
    t0 = time.time()
    make_data(root, N_IMAGES, N_VAL, IMGSZ)
    print(f"dataset: {N_IMAGES}+{N_VAL} images at {IMGSZ}px "
          f"({time.time()-t0:.0f}s to generate)", flush=True)

    starts, ends, last_batch = [], [], []
    cbs = Callbacks()

    def _start(*a, **k):
        starts.append(time.time())
        last_batch.append(time.time())

    cbs.register_action("on_train_epoch_start", "t", _start)
    # last on_train_batch_end of the epoch marks the train-phase end; the
    # remainder to on_model_save is val + logging + checkpointing
    cbs.register_action(
        "on_train_batch_end", "t",
        lambda *a, **k: last_batch.__setitem__(-1, time.time()),
    )
    # on_model_save fires after val + logging + checkpointing — the full
    # epoch composition the anchor's 823.6 s/epoch includes
    cbs.register_action(
        "on_model_save", "t", lambda *a, **k: ends.append(time.time())
    )

    train(
        cfg=CFG,
        train_path=str(root / "train" / "images"),
        val_path=str(root / "val" / "images"),
        nc=NC,
        epochs=EPOCHS,
        batch_size=BATCH,
        imgsz=IMGSZ,
        max_labels=16,
        patience=EPOCHS,
        val_every=1,
        save_dir=str(root / "exp"),
        workers=WORKERS,
        bf16=BF16,
        cache=CACHE,
        device_augment=DEVAUG,
        steps_per_call=SPC,
        autoanchor=False,  # keep the timing about the loop, not the GA
        callbacks=cbs,
    )

    # epoch 0 pays the XLA compiles; report the steady-state epochs
    durs = [e - s for s, e in zip(starts, ends)]
    steady = durs[1:] if len(durs) > 1 else durs
    per_epoch = float(np.mean(steady))
    imgs_per_sec = N_IMAGES / per_epoch
    print(json.dumps({
        "metric": "epoch_e2e_train",
        "cfg": CFG, "batch": BATCH, "imgsz": IMGSZ, "bf16": BF16,
        "cache": CACHE, "device_augment": DEVAUG, "steps_per_call": SPC,
        "n_train": N_IMAGES, "n_val": N_VAL, "workers": WORKERS,
        "epoch_s": round(per_epoch, 1),
        "epoch_imgs_per_sec": round(imgs_per_sec, 2),
        "first_epoch_s_incl_compile": round(durs[0], 1),
        "all_epoch_s": [round(d, 1) for d in durs],
        "train_phase_s": [round(lb - s, 1)
                          for s, lb in zip(starts, last_batch)],
        "val_ckpt_phase_s": [round(e - lb, 1)
                             for lb, e in zip(last_batch, ends)],
    }), flush=True)


if __name__ == "__main__":
    main()
