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


def test_semantic_map_rasterization(seg_data):
    """semantic=True adds an int class-id map built from thing polygons +
    stuff/xxx.txt polygons (reference utils/panoptic/dataloaders.py)."""
    # add a stuff polygon (class 1 = first stuff id for nc=1) covering the
    # top-left quadrant of every train image
    stuff = seg_data / "train" / "stuff"
    stuff.mkdir(exist_ok=True)
    for i in range(4):
        (stuff / f"{i}.txt").write_text(
            "1 0.0 0.0 0.5 0.0 0.5 0.5 0.0 0.5\n"
        )
    ds = SegmentDataset(str(seg_data / "train" / "images"), img_size=64,
                        augment=False, max_labels=4, semantic=True)
    img, labels, valid, masks, sem = ds[0]
    assert sem.shape == (16, 16) and sem.dtype == np.int32
    # background is -1; the stuff quadrant holds 1; the thing polygon 0
    assert (sem == -1).any() and (sem == 1).any() and (sem == 0).any()
    # the thing mask region is labeled with the thing class (0), which
    # overwrites stuff where they overlap
    inst = masks[0] > 0.5
    assert (sem[inst] == 0).mean() > 0.9


def test_semantic_loss_numerics():
    """semantic_loss == hand-computed sigmoid-focal (alpha .25, gamma 2,
    torchvision formula the reference calls) + softmax dice, with the
    reference gains (utils/panoptic/loss_tal.py:252-272)."""
    from ecs_yolo_tpu.nn.segment import semantic_loss

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 6).astype(np.float32)
    sem_gt = rng.randint(-1, 6, size=(2, 8, 8)).astype(np.int32)
    lf, ld = semantic_loss(jnp.asarray(logits), jnp.asarray(sem_gt))

    onehot = np.zeros((2, 8, 8, 6), np.float32)
    for b in range(2):
        for y in range(8):
            for x in range(8):
                if sem_gt[b, y, x] >= 0:
                    onehot[b, y, x, sem_gt[b, y, x]] = 1
    p = 1 / (1 + np.exp(-logits))
    ce = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = 0.25 * onehot + 0.75 * (1 - onehot)
    focal = (a_t * ce * (1 - p_t) ** 2).mean() / 2 * 20 * 2.5
    sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    dice = (2 * (sm * onehot).sum() + 1) / ((sm + onehot).sum() + 1)
    dice_l = (1 - dice) / 2 * 2.5
    assert float(lf) == pytest.approx(focal, rel=1e-4)
    assert float(ld) == pytest.approx(dice_l, rel=1e-4)


def test_panoptic_train_step(seg_data):
    """Panoptic step with instance masks + semantic map: 6 loss items
    (box, mask, cls, dfl, sem_focal, sem_dice), all finite, sem terms live
    (reference utils/panoptic/loss_tal.py:183-280)."""
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.train.optim import build_optimizer
    from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

    HYP = dict(box=7.5, cls=0.5, dfl=1.5, mask=2.5, obj=1.0, cls_pw=1.0,
               obj_pw=1.0, anchor_t=4.0, fl_gamma=0.0, label_smoothing=0.0,
               slide_ratio=0.0)
    model = build_model("res10-panoptic.yaml", nc=1, snn=SNN)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    tx = build_optimizer(variables["params"], epochs=1, steps_per_epoch=2)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, HYP, with_masks=True,
                           with_semantic=True)

    ds = SegmentDataset(str(seg_data / "train" / "images"), img_size=64,
                        augment=False, max_labels=4, semantic=True)
    ims, lbs, ms, masks, sem = next(iter(ds.batches(2)))
    state, metrics = step(
        state, jnp.asarray(ims), jnp.asarray(lbs), jnp.asarray(ms),
        jnp.asarray(masks), jnp.asarray(sem),
    )
    items = np.asarray(metrics["items"])
    assert items.shape == (6,)
    assert np.isfinite(items).all()
    assert items[1] > 0 and items[4] > 0 and items[5] > 0


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
