"""Event pipeline tests: synthetic .dat streams -> voxelize -> dataset ->
model event-mode forward."""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.data.events import (
    BBOX_DTYPE,
    DatReader,
    EventDataset,
    build_dataset,
    normalize_boxes,
    paint_events,
    voxelize_sample,
)


def write_dat(path, events):
    """events: list of (t, x, y, p)."""
    with open(path, "wb") as fh:
        fh.write(b"% Test stream\n% height 240\n% width 304\n")
        fh.write(bytes([0x0C]))  # event type
        fh.write(bytes([8]))  # event size
        for t, x, y, p in events:
            word = (x & 0x3FFF) | ((y & 0x3FFF) << 14) | ((p & 0xF) << 28)
            fh.write(struct.pack("<II", t, word))


@pytest.fixture()
def dat_file(tmp_path):
    rng = np.random.RandomState(0)
    events = []
    for t in range(0, 600_000, 100):
        x = int(rng.randint(0, 304))
        y = int(rng.randint(0, 240))
        p = int(rng.randint(0, 2))
        events.append((t, x, y, p))
    p = tmp_path / "stream_td.dat"
    write_dat(p, events)
    return p, events


class TestDatReader:
    def test_reads_all(self, dat_file):
        p, events = dat_file
        r = DatReader(p)
        assert r.n_events == len(events)

    def test_seek_and_slice(self, dat_file):
        p, events = dat_file
        r = DatReader(p)
        r.seek_time(100_000)
        ev = r.load_delta_t(50_000)
        assert (ev["t"] >= 100_000).all() and (ev["t"] < 150_000).all()
        # decode round-trips
        want = [e for e in events if 100_000 <= e[0] < 150_000]
        assert len(ev) == len(want)
        assert ev["x"][0] == want[0][1] and ev["y"][0] == want[0][2]


def test_paint_events():
    ev = np.zeros(2, dtype=[("t", "<i8"), ("x", "<i4"), ("y", "<i4"), ("p", "<i4")])
    ev["x"] = [10, 20]
    ev["y"] = [5, 6]
    ev["p"] = [1, 0]
    img = paint_events(ev)
    assert img[5, 10, 0] == 255
    assert img[6, 20, 0] == 0
    assert img[0, 0, 0] == 127


def test_voxelize_shape(dat_file):
    p, _ = dat_file
    r = DatReader(p)
    v = voxelize_sample(r, 500_000, sample_size=250_000, t_bins=5)
    assert v.shape == (5, 240, 304, 3)
    assert v.dtype == np.uint8


def test_normalize_boxes_dedup():
    b = np.zeros(3, dtype=BBOX_DTYPE)
    b["ts"] = [100, 100, 100]
    b["x"] = [10, 50, 12]
    b["y"] = [10, 50, 12]
    b["w"] = [40, 60, 40]
    b["h"] = [30, 50, 30]
    b["class_id"] = [0, 1, 0]
    b["track_id"] = [7, 8, 7]  # 7 appears twice -> keep last
    out = normalize_boxes(b)
    assert out.shape == (2, 5)
    assert (out[:, 1:] <= 1).all() and (out[:, 1:] >= 0).all()


def test_build_dataset_and_event_forward(dat_file, tmp_path):
    p, _ = dat_file
    boxes = np.zeros(4, dtype=BBOX_DTYPE)
    boxes["ts"] = [300_000, 300_000, 400_000, 400_000]
    boxes["x"] = [50, 150, 60, 160]
    boxes["y"] = [40, 120, 50, 130]
    boxes["w"] = [60, 80, 60, 80]
    boxes["h"] = [50, 70, 50, 70]
    boxes["class_id"] = [0, 1, 0, 1]
    boxes["track_id"] = [1, 2, 1, 2]
    lbl_p = tmp_path / "boxes.npy"
    np.save(lbl_p, boxes)

    n = build_dataset([(str(p), str(lbl_p))], tmp_path / "vox", t_bins=2)
    assert n == 2

    ds = EventDataset(tmp_path / "vox" / "train.txt", img_size=64, max_labels=8)
    ims, lbs, ms = next(ds.batches(2))
    assert ims.shape == (2, 2, 64, 64, 3)  # [B, T, H, W, C]
    assert ms.sum() == 4

    # event batch feeds the standard model (5-D input -> event mode)
    from ecs_yolo_tpu.models.yolo import build_model

    model = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    z, feats = model.apply(variables, jnp.asarray(ims), training=False)
    assert z.shape[0] == 2
