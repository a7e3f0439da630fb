"""Export tests: StableHLO always; SavedModel parity when TF present."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu import export as export_mod


@pytest.fixture(scope="module")
def model():
    m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_stablehlo_export(model, tmp_path):
    m, v = model
    out = export_mod.run(m, v, include=("stablehlo",), out_dir=tmp_path,
                         imgsz=64)
    text = out["stablehlo"].read_text()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text


def test_orbax_export(model, tmp_path):
    m, v = model
    out = export_mod.run(m, v, include=("orbax",), out_dir=tmp_path, imgsz=64)
    assert out["orbax"].exists()


@pytest.mark.slow
def test_tflite_int8_export(model, tmp_path):
    """int8 PTQ path (reference export.py --int8): converts and runs."""
    tf = pytest.importorskip("tensorflow")
    m, v = model
    out = export_mod.run(
        m, v, include=("tflite",), out_dir=tmp_path, imgsz=64, int8=True
    )
    path = out["tflite"]
    assert path.exists() and path.stat().st_size > 0
    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    x = np.random.RandomState(0).rand(*inp["shape"])
    if inp["dtype"] == np.uint8:  # full-int8 conversion succeeded
        x = (x * 255).astype(np.uint8)
    else:  # hybrid fallback keeps float I/O
        x = x.astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert np.isfinite(np.asarray(y, np.float32)).all()

    # quantization-quality bound (VERDICT r3 item 6): the dequantized int8
    # output must track the native forward — catches a silently broken
    # calibration even with random weights.  (The trained-accuracy delta is
    # measured by scripts/validate_int8.py and recorded in BASELINE.md §6.)
    from ecs_yolo_tpu.backends import DetectMultiBackend

    be = DetectMultiBackend(path, cfg="resnet10.yaml", nc=2)
    xf = np.random.RandomState(1).rand(*inp["shape"]).astype(np.float32)
    y8 = np.asarray(be.predict(xf), np.float32).reshape(-1, 7)
    yn = np.asarray(
        m.apply(v, jnp.asarray(xf), training=False)[0], np.float32
    ).reshape(-1, 7)
    # Only the sigmoid-bounded columns (x, y, objectness) are checkable with
    # random weights: the unbounded w/h regression columns of an UNTRAINED
    # net span ~0-350 and saturate the single uint8 output scale (expected
    # PTQ clipping — the trained artifact's accuracy is what matters, and
    # scripts/validate_int8.py measures that: no mAP loss, BASELINE.md §6).
    for col, name in ((0, "x"), (1, "y"), (4, "obj")):
        corr = np.corrcoef(y8[:, col], yn[:, col])[0, 1]
        assert corr > 0.9, (
            f"int8 {name} column decorrelated from native: r={corr:.3f}"
        )


@pytest.mark.slow
def test_saved_model_parity(model, tmp_path):
    tf = pytest.importorskip("tensorflow")
    m, v = model
    out = export_mod.run(
        m, v, include=("saved_model",), out_dir=tmp_path, imgsz=64
    )
    loaded = tf.saved_model.load(str(out["saved_model"]))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    tf_y = np.asarray(loaded.f(tf.constant(x)))
    jax_y = np.asarray(m.apply(v, jnp.asarray(x), training=False)[0])
    np.testing.assert_allclose(tf_y, jax_y, atol=1e-3, rtol=1e-3)
