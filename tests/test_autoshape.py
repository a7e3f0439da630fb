"""AutoShape/Detections end-user API (reference models/common.py:1957-2142):
input robustness, native-space boxes, result views, pandas/tolist/crop."""

import numpy as np
import pytest
from PIL import Image

from ecs_yolo_tpu import hub
from ecs_yolo_tpu.autoshape import AutoShape, Detections, xyxy2xywh


@pytest.fixture(scope="module")
def wrapper():
    model, variables = hub.create("resnet10.yaml", nc=2)
    return AutoShape(model, variables, names=["cat", "dog"], size=64)


@pytest.fixture(scope="module")
def results(wrapper, tmp_path_factory):
    p = tmp_path_factory.mktemp("autoshape") / "img.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(p)
    inputs = [
        str(p),                                        # path
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)),  # PIL
        (rng.rand(3, 40, 50) * 255).astype(np.uint8),  # CHW numpy
        (rng.rand(40, 50) * 255).astype(np.uint8),     # grayscale
    ]
    return wrapper(inputs)


class TestAutoShape:
    def test_batch_and_views(self, results):
        assert len(results) == 4
        assert len(results.xyxy) == len(results.xywh) == 4
        for p, im in zip(results.pred, results.imgs):
            assert p.ndim == 2 and p.shape[1] == 6
            h, w = im.shape[:2]
            if len(p):
                # native-space boxes are inside the ORIGINAL image
                assert p[:, [0, 2]].max() <= w + 1e-3
                assert p[:, [1, 3]].max() <= h + 1e-3

    def test_normalized_views_unit_range(self, results):
        for pn in results.xyxyn:
            if len(pn):
                assert pn[:, :4].min() >= -1e-6 and pn[:, :4].max() <= 1 + 1e-6

    def test_xywh_roundtrip(self):
        x = np.array([[10.0, 20.0, 30.0, 60.0]])
        w = xyxy2xywh(x)
        np.testing.assert_allclose(w, [[20, 40, 20, 40]])

    def test_pandas(self, results):
        df = results.pandas().xyxy[0]
        assert list(df.columns) == [
            "xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"
        ]

    def test_tolist(self, results):
        singles = results.tolist()
        assert len(singles) == 4
        assert singles[0].pred.shape[1] == 6  # popped out of the list

    def test_render_and_save(self, results, tmp_path):
        imgs = results.render()
        assert imgs[0].dtype == np.uint8
        out = results.save(save_dir=str(tmp_path / "exp"))
        assert sorted(f.name for f in out.iterdir()) == sorted(
            set(results.files)
        )

    def test_print(self, results, capsys):
        results.print()  # exercises the summary path

    def test_classes_filter(self, wrapper):
        wrapper.classes = [0]
        try:
            r = wrapper(np.zeros((32, 32, 3), np.uint8))
            for p in r.pred:
                if len(p):
                    assert (p[:, 5].astype(int) == 0).all()
        finally:
            wrapper.classes = None

    def test_hub_create_autoshape(self):
        m = hub.create("resnet10.yaml", nc=1, autoshape=True,
                       names=["x"], imgsz=64)
        assert isinstance(m, AutoShape)


class TestDetectionsStandalone:
    def test_empty_pred(self):
        d = Detections(
            [np.zeros((16, 16, 3), np.uint8)],
            [np.zeros((0, 6), np.float32)],
            ["a.jpg"], names=["x"], shape=(1, 16, 16, 3),
        )
        assert len(d) == 1
        assert d._display(crop=True, save=False) == []
