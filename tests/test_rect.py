"""Rect-mode dataset: aspect-ratio buckets with static per-bucket shapes."""

import numpy as np
import pytest
from PIL import Image

from ecs_yolo_tpu.data.dataset import Dataset


@pytest.fixture(scope="module")
def aspect_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("rect")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    sizes = [(200, 400), (210, 400), (400, 200), (390, 210), (300, 300),
             (320, 300)]
    for i, (h, w) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"im{i}.jpg")
        (root / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    return root


def test_rect_buckets(aspect_dataset):
    ds = Dataset(
        str(aspect_dataset / "images"), img_size=320, augment=False,
        rect=True, rect_buckets=3,
    )
    # bucket shapes are stride multiples, not all square
    shapes = {tuple(s) for s in ds.batch_shape}
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in shapes)
    assert any(h != w for h, w in shapes)

    # wide images get short-height buckets
    wide_idx = 0  # 200x400
    tall_idx = 2  # 400x200
    assert ds.batch_shape[wide_idx][0] <= ds.batch_shape[wide_idx][1]
    assert ds.batch_shape[tall_idx][0] >= ds.batch_shape[tall_idx][1]


def test_rect_batches_consistent_shapes(aspect_dataset):
    ds = Dataset(
        str(aspect_dataset / "images"), img_size=320, augment=False,
        rect=True, rect_buckets=3,
    )
    seen = set()
    total = 0
    for ims, lbs, ms in ds.batches(2, drop_last=False):
        assert ims.shape[0] == 2
        seen.add(ims.shape[1:3])
        total += int((ms.sum(1) > 0).sum())
    assert len(seen) <= 3
    assert total == 6  # every image appears exactly once


def test_rect_labels_valid(aspect_dataset):
    ds = Dataset(
        str(aspect_dataset / "images"), img_size=320, augment=False, rect=True
    )
    img, labels, mask = ds[0]
    lb = labels[mask]
    assert (lb[:, 1:] >= 0).all() and (lb[:, 1:] <= 1).all()
