"""End-to-end slice: train a tiny model for 2 epochs on synthetic data,
validate (mAP path), run detect, checkpoint round-trip."""

import numpy as np
import pytest
from PIL import Image

import jax

from ecs_yolo_tpu.train.driver import train
from ecs_yolo_tpu.utils.checkpoint import load_checkpoint
from ecs_yolo_tpu import detect as detect_mod
from ecs_yolo_tpu import val as val_mod
from ecs_yolo_tpu.models.yolo import build_model


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    """Synthetic detection set: bright rectangles on dark background."""
    root = tmp_path_factory.mktemp("synth")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.RandomState(0 if split == "train" else 1)
        for i in range(8):
            img = (rng.rand(96, 96, 3) * 40).astype(np.uint8)
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.2, 0.4, 2)
            x1, y1 = int((cx - w / 2) * 96), int((cy - h / 2) * 96)
            x2, y2 = int((cx + w / 2) * 96), int((cy + h / 2) * 96)
            img[y1:y2, x1:x2] = [220, 60, 60]
            Image.fromarray(img).save(root / split / "images" / f"{i}.jpg")
            with open(root / split / "labels" / f"{i}.txt", "w") as fh:
                fh.write(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}\n")
    return root


@pytest.mark.slow
def test_train_val_detect_roundtrip(synth_data, tmp_path):
    state, best_fit, history = train(
        cfg="resnet10.yaml",
        train_path=str(synth_data / "train" / "images"),
        val_path=str(synth_data / "val" / "images"),
        nc=1,
        epochs=2,
        batch_size=4,
        imgsz=64,
        max_labels=16,
        patience=10,
        save_dir=str(tmp_path / "exp"),
        hyp=dict(mosaic=0.0, fliplr=0.0, warmup_epochs=0.1),
    )
    assert int(state.step) == 4  # 8 imgs / bs4 * 2 epochs
    assert len(history) == 2
    assert np.isfinite(best_fit)

    # checkpoint written and loadable
    ckpt_dir = tmp_path / "exp" / "weights" / "last"
    tree, meta = load_checkpoint(ckpt_dir)
    assert "params" in tree and meta["epoch"] == 1

    # results.csv exists with 2 rows + header
    csv = (tmp_path / "exp" / "results.csv").read_text().strip().splitlines()
    assert len(csv) == 3

    # detect runs end-to-end on the trained weights
    model = build_model("resnet10.yaml", nc=1)
    variables = {
        "params": tree["ema_params"],
        "batch_stats": tree["batch_stats"],
    }
    results = detect_mod.run(
        model, variables, str(synth_data / "val" / "images"),
        imgsz=64, conf_thres=0.01, save_dir=str(tmp_path / "det"),
        save_txt=True,
    )
    assert len(results) == 8
    # annotated images saved
    assert len(list((tmp_path / "det").glob("*.jpg"))) == 8


@pytest.mark.slow
def test_train_device_augment_cached(synth_data, tmp_path):
    """--cache ram + --device-augment: augmentation (mosaic/affine/HSV/
    flip) runs jit-compiled on the accelerator and the host serves decoded
    images from RAM (data/device_augment.py; no reference equivalent —
    utils/datasets.py:553-624 does all of it in DataLoader workers).  The
    full driver must train, descend and validate through this path."""
    state, best_fit, history = train(
        cfg="resnet10.yaml",
        train_path=str(synth_data / "train" / "images"),
        val_path=str(synth_data / "val" / "images"),
        nc=1,
        epochs=2,
        batch_size=4,
        imgsz=64,
        max_labels=16,
        patience=10,
        save_dir=str(tmp_path / "exp"),
        hyp=dict(mosaic=1.0, fliplr=0.5, warmup_epochs=0.1),
        cache="ram",
        device_augment=True,
        steps_per_call=2,  # both epoch batches in ONE compiled scan call
        autoanchor=False,
    )
    assert int(state.step) == 4
    assert len(history) == 2
    assert np.isfinite(best_fit)


@pytest.mark.slow
def test_steps_per_call_parity(synth_data, tmp_path):
    """steps_per_call=K chains K steps in one lax.scan call; with identical
    data order and no stochastic augmentation it must reproduce the
    per-step path's training state (same step count, ~same losses)."""
    common = dict(
        cfg="resnet10.yaml",
        train_path=str(synth_data / "train" / "images"),
        val_path=None,
        nc=1,
        epochs=1,
        batch_size=4,
        imgsz=64,
        max_labels=16,
        patience=10,
        hyp=dict(mosaic=0.0, fliplr=0.0, warmup_epochs=0.1),
        autoanchor=False,
        workers=0,
        seed=7,
    )
    s1, _, _ = train(save_dir=str(tmp_path / "a"), **common)
    s2, _, _ = train(save_dir=str(tmp_path / "b"), steps_per_call=2,
                     **common)
    assert int(s1.step) == int(s2.step) == 2
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
