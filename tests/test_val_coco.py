"""COCO-json + native-space validation path.

Covers VERDICT r1 item 4: real image ids (numeric stems), predictions and
labels evaluated at NATIVE resolution (reference val.py:309 scale_coords,
save_one_json val.py:56-78), and the pure-numpy COCOeval fallback
(ops/cocoeval.py) agreeing with the internal ap_per_class metrics.
"""

import json
from types import SimpleNamespace

import numpy as np
import pytest
from PIL import Image

from ecs_yolo_tpu import val as val_mod
from ecs_yolo_tpu.data.dataset import Dataset
from ecs_yolo_tpu.ops.cocoeval import COCOeval, dataset_to_coco_gt, evaluate_json


# -- cocoeval unit: a hand-computed AP ---------------------------------------


def test_cocoeval_known_ap():
    gt = dict(
        images=[dict(id=7, width=100, height=100)],
        annotations=[
            dict(id=1, image_id=7, category_id=0,
                 bbox=[10, 10, 20, 20], area=400, iscrowd=0),
            dict(id=2, image_id=7, category_id=0,
                 bbox=[50, 50, 20, 20], area=400, iscrowd=0),
        ],
        categories=[dict(id=0, name="a")],
    )
    dt = [
        dict(image_id=7, category_id=0, bbox=[10, 10, 20, 20], score=0.9),
        dict(image_id=7, category_id=0, bbox=[80, 80, 10, 10], score=0.8),
    ]
    res = COCOeval(gt, dt).evaluate()
    # rank 1: TP (p=1, r=.5); rank 2: FP. 101-pt interp AP = 51/101
    assert res["map50"] == pytest.approx(51 / 101, abs=1e-6)
    # the perfect-IoU match holds at every threshold
    assert res["map"] == pytest.approx(51 / 101, abs=1e-6)
    assert res["ar100"] == pytest.approx(0.5, abs=1e-6)


def test_cocoeval_crowd_ignored():
    gt = dict(
        images=[dict(id=1, width=64, height=64)],
        annotations=[
            dict(id=1, image_id=1, category_id=0,
                 bbox=[0, 0, 30, 30], area=900, iscrowd=1),
            dict(id=2, image_id=1, category_id=0,
                 bbox=[40, 40, 10, 10], area=100, iscrowd=0),
        ],
        categories=[dict(id=0)],
    )
    # det inside the crowd region matches the crowd gt -> ignored, not FP
    dt = [
        dict(image_id=1, category_id=0, bbox=[40, 40, 10, 10], score=0.9),
        dict(image_id=1, category_id=0, bbox=[5, 5, 20, 20], score=0.8),
    ]
    res = COCOeval(gt, dt).evaluate()
    assert res["map50"] == pytest.approx(1.0, abs=1e-6)


# -- synthetic dataset with numeric stems and non-square natives -------------


@pytest.fixture
def coco_ds(tmp_path):
    imgs = tmp_path / "images"
    lbls = tmp_path / "labels"
    imgs.mkdir()
    lbls.mkdir()
    # (id, native h, native w, gt native xyxy, cls)
    spec = [
        (1000, 48, 64, (8, 12, 40, 36), 0),
        (1001, 80, 40, (10, 20, 30, 70), 1),
    ]
    for iid, h, w, (x1, y1, x2, y2), cls in spec:
        arr = np.full((h, w, 3), 100, np.uint8)
        arr[y1:y2, x1:x2] = 220
        Image.fromarray(arr).save(imgs / f"{iid}.jpg")
        xc, yc = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
        bw, bh = (x2 - x1) / w, (y2 - y1) / h
        (lbls / f"{iid}.txt").write_text(f"{cls} {xc} {yc} {bw} {bh}\n")
    ds = Dataset(str(imgs), img_size=64, augment=False, max_labels=8)
    return ds, spec


def test_meta_ids_and_ratio_pad(coco_ds):
    ds, spec = coco_ds
    for i, (iid, h, w, box, cls) in enumerate(spec):
        m = ds.meta(i)
        assert m["id"] == iid
        assert m["native_hw"] == (h, w)
        (gy, gx), (pw, ph) = m["ratio_pad"]
        # canvas coords of the native box corners must land inside the canvas
        ch, cw = m["canvas_hw"]
        assert 0 <= box[0] * gx + pw <= cw
        assert 0 <= box[3] * gy + ph <= ch


def test_dataset_to_coco_gt(coco_ds):
    ds, spec = coco_ds
    gt = dataset_to_coco_gt(ds, class_names=["a", "b"])
    assert {im["id"] for im in gt["images"]} == {1000, 1001}
    a0 = next(a for a in gt["annotations"] if a["image_id"] == 1000)
    x, y, w, h = a0["bbox"]
    assert (x, y, x + w, y + h) == pytest.approx(spec[0][3], abs=0.5)


# -- end-to-end: fake model emitting the GT -> perfect mAP everywhere --------


class _OracleModule:
    """Pretends to be a flax module: returns [B, A, 5+nc] v1-layout
    predictions (canvas-pixel xywh, obj, cls) encoding each image's GT."""

    def __init__(self, ds, nc=2, A=4):
        self.ds = ds
        self.nc = nc
        self.A = A
        self._batch_order = []

    def apply(self, variables, x, training=False):
        B = x.shape[0]
        pred = np.zeros((B, self.A, 5 + self.nc), np.float32)
        for si in range(B):
            if not self._batch_order:
                break
            i = self._batch_order.pop(0)
            m = self.ds.meta(i)
            (gy, gx), (pw, ph) = m["ratio_pad"]
            h0, w0 = m["native_hw"]
            for cls, xc, yc, bw, bh in self.ds.labels[i]:
                # native -> canvas letterbox pixels
                cx, cy = xc * w0 * gx + pw, yc * h0 * gy + ph
                cw_, ch_ = bw * w0 * gx, bh * h0 * gy
                pred[si, 0, :4] = [cx, cy, cw_, ch_]
                pred[si, 0, 4] = 0.9
                pred[si, 0, 5 + int(cls)] = 1.0
        import jax.numpy as jnp

        return jnp.asarray(pred), None


def test_val_native_space_and_coco_json(coco_ds, tmp_path):
    ds, spec = coco_ds
    module = _OracleModule(ds)
    # feed the oracle the batch order val will use (no shuffle)
    module._batch_order = list(range(len(ds)))
    model = SimpleNamespace(module=module, head_name="Detect", nc=2)

    det_json = tmp_path / "dets.json"
    anno_json = tmp_path / "anno.json"
    anno_json.write_text(json.dumps(dataset_to_coco_gt(ds, ["a", "b"])))

    res = val_mod.run(
        model, {}, None, imgsz=64, batch_size=2, dataset=ds,
        save_json=str(det_json), anno_json=str(anno_json),
    )
    # internal metrics at native resolution: the oracle is perfect
    # (ap_per_class's trapezoid interp tops out at ~0.995 for one det)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    # json carries the REAL ids and NATIVE-space boxes
    dets = json.loads(det_json.read_text())
    assert {d["image_id"] for d in dets} == {1000, 1001}
    d0 = next(d for d in dets if d["image_id"] == 1000)
    x, y, w, h = d0["bbox"]
    assert (x, y, x + w, y + h) == pytest.approx(spec[0][3], abs=1.0)
    # the COCO-json path agrees with the internal path
    assert res["coco"]["map50"] == pytest.approx(res["map50"], abs=0.02)
    assert res["coco"]["map"] >= 0.9


def test_evaluate_json_files(coco_ds, tmp_path):
    ds, _ = coco_ds
    anno = tmp_path / "a.json"
    anno.write_text(json.dumps(dataset_to_coco_gt(ds, ["a", "b"])))
    gt = json.loads(anno.read_text())
    dets = [
        dict(image_id=a["image_id"], category_id=a["category_id"],
             bbox=a["bbox"], score=0.95)
        for a in gt["annotations"]
    ]
    det = tmp_path / "d.json"
    det.write_text(json.dumps(dets))
    res = evaluate_json(str(anno), str(det))
    assert res["map50"] == pytest.approx(1.0, abs=1e-6)
    assert res["map"] == pytest.approx(1.0, abs=1e-6)
