"""Segmentation training end-to-end: polygon labels -> SegmentDataset masks
-> composite detection+mask loss -> driver (reference utils/segment stack:
dataloaders.py polygon parsing, loss_tal.py:170-252 gains 7.5/2.5/0.5/1.5).
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.data.dataset import SegmentDataset, load_segment_label_file

SNN = SNNConfig(time_window=2)


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.RandomState(0 if split == "train" else 1)
        for i in range(4):
            img = (rng.rand(64, 64, 3) * 50).astype(np.uint8)
            x1, y1 = rng.uniform(0.1, 0.4, 2)
            x2, y2 = x1 + rng.uniform(0.25, 0.45), y1 + rng.uniform(0.25, 0.45)
            x2, y2 = min(x2, 0.95), min(y2, 0.95)
            img[int(y1 * 64):int(y2 * 64), int(x1 * 64):int(x2 * 64)] = 210
            Image.fromarray(img).save(root / split / "images" / f"{i}.jpg")
            (root / split / "labels" / f"{i}.txt").write_text(
                f"0 {x1:.4f} {y1:.4f} {x2:.4f} {y1:.4f} "
                f"{x2:.4f} {y2:.4f} {x1:.4f} {y2:.4f}\n"
            )
    return root


def test_polygon_label_parsing(seg_data):
    lb, segs = load_segment_label_file(
        str(seg_data / "train" / "labels" / "0.txt"))
    assert lb.shape == (1, 5) and len(segs) == 1 and segs[0].shape == (4, 2)
    # box == polygon extent
    x1, y1 = segs[0].min(0)
    x2, y2 = segs[0].max(0)
    assert lb[0, 1] == pytest.approx((x1 + x2) / 2, abs=1e-5)
    assert lb[0, 3] == pytest.approx(x2 - x1, abs=1e-5)


def test_mask_rasterization_matches_box(seg_data):
    ds = SegmentDataset(str(seg_data / "train" / "images"), img_size=64,
                        augment=False, max_labels=4)
    img, labels, valid, masks = ds[0]
    assert masks.shape == (4, 16, 16)
    assert valid[0] and not valid[1]
    # mask area approximates the (normalized) box area on the 16x16 grid
    area_mask = masks[0].sum() / (16 * 16)
    area_box = float(labels[0, 3] * labels[0, 4])
    assert area_mask == pytest.approx(area_box, abs=0.08)
    # mask centroid inside the box
    ys, xs = np.nonzero(masks[0] > 0.5)
    cx, cy = xs.mean() / 16, ys.mean() / 16
    assert abs(cx - labels[0, 1]) < 0.12 and abs(cy - labels[0, 2]) < 0.12


def test_segment_train_step(seg_data):
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.train.optim import build_optimizer
    from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

    HYP = dict(box=7.5, cls=0.5, dfl=1.5, mask=2.5, obj=1.0, cls_pw=1.0,
               obj_pw=1.0, anchor_t=4.0, fl_gamma=0.0, label_smoothing=0.0,
               slide_ratio=0.0)
    model = build_model("res10-seg.yaml", nc=1, snn=SNN)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    tx = build_optimizer(variables["params"], epochs=1, steps_per_epoch=2)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, HYP, with_masks=True)

    ds = SegmentDataset(str(seg_data / "train" / "images"), img_size=64,
                        augment=False, max_labels=4)
    ims, lbs, ms, masks = next(iter(ds.batches(2)))
    state, metrics = step(
        state, jnp.asarray(ims), jnp.asarray(lbs), jnp.asarray(ms),
        jnp.asarray(masks),
    )
    items = np.asarray(metrics["items"])
    assert items.shape == (4,)  # box, mask, cls, dfl
    assert np.isfinite(items).all()
    assert items[1] > 0  # the mask term is live


@pytest.mark.slow
def test_segment_driver_e2e(seg_data, tmp_path):
    from ecs_yolo_tpu.train.driver import train

    state, best_fit, history = train(
        cfg="res10-seg.yaml",
        train_path=str(seg_data / "train" / "images"),
        val_path=str(seg_data / "val" / "images"),
        nc=1,
        epochs=1,
        batch_size=2,
        imgsz=64,
        max_labels=4,
        save_dir=str(tmp_path / "exp"),
        hyp=dict(warmup_epochs=0.1),
        autoanchor=False,
        workers=0,
    )
    assert len(history) == 1
    assert np.isfinite(best_fit)
