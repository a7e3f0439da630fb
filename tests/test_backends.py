"""DetectMultiBackend: exported-artifact inference parity.

Reference models/common.py DetectMultiBackend dispatches weights by
suffix; here the runnable formats are native/orbax, TFLite, SavedModel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu import export as export_mod
from ecs_yolo_tpu.backends import DetectMultiBackend


@pytest.fixture(scope="module")
def model():
    m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


@pytest.fixture(scope="module")
def native_pred(model):
    m, v = model
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    y = np.asarray(m.apply(v, jnp.asarray(x), training=False)[0])
    return x, y


@pytest.mark.slow
def test_saved_model_backend(model, native_pred, tmp_path):
    pytest.importorskip("tensorflow")
    m, v = model
    out = export_mod.run(m, v, include=("saved_model",), out_dir=tmp_path,
                         imgsz=64, names=["a", "b"])
    be = DetectMultiBackend(out["saved_model"])
    assert be.format == "saved_model"
    assert be.head_name == m.head_name and be.nc == 2
    assert be.names == ["a", "b"]  # metadata.json sidecar round-trip
    x, y_ref = native_pred
    y = be.predict(x)
    np.testing.assert_allclose(y, y_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_tflite_backend(model, native_pred, tmp_path):
    pytest.importorskip("tensorflow")
    m, v = model
    out = export_mod.run(m, v, include=("tflite",), out_dir=tmp_path,
                         imgsz=64)
    be = DetectMultiBackend(out["tflite"])
    assert be.format == "tflite"
    x, y_ref = native_pred
    y = be.predict(x)
    # float tflite: same graph, looser kernel tolerances
    np.testing.assert_allclose(y, y_ref, atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_backend_detect_run(model, tmp_path):
    """detect.run drives a DetectMultiBackend end to end (reference
    detect.py:97)."""
    pytest.importorskip("tensorflow")
    from PIL import Image

    from ecs_yolo_tpu import detect as detect_mod

    m, v = model
    out = export_mod.run(m, v, include=("saved_model",), out_dir=tmp_path,
                         imgsz=64)
    img = (np.random.RandomState(1).rand(48, 56, 3) * 255).astype(np.uint8)
    src = tmp_path / "im.jpg"
    Image.fromarray(img).save(src)
    be = DetectMultiBackend(out["saved_model"])
    results = detect_mod.run(be, None, str(src), imgsz=64,
                             conf_thres=0.0, max_det=5)
    assert len(results) == 1
    path, dets = results[0]
    assert dets.shape[1] == 6
