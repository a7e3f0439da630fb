"""Model assembly tests: YAML -> module -> forward shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model


@pytest.fixture(scope="module")
def res10():
    m = build_model("resnet10.yaml")
    key = jax.random.PRNGKey(0)
    variables = m.init(key, imgsz=64)
    return m, variables


class TestResnet10:
    def test_strides(self, res10):
        m, _ = res10
        assert m.strides == (16.0, 32.0)

    def test_anchor_scaling(self, res10):
        m, _ = res10
        a = m.head["anchors_grid"]
        # anchors divided by strides: 10/16, 81/32 ...
        assert a[0][0] == pytest.approx(10 / 16)
        assert a[1][0] == pytest.approx(81 / 32)

    def test_train_forward_shapes(self, res10):
        m, variables = res10
        x = jnp.zeros((2, 64, 64, 3))
        out = m.apply(variables, x, training=False)
        # eval returns (decoded, feats)
        z, feats = out
        na, no = 3, 13 + 5
        assert feats[0].shape == (2, na, 4, 4, no)  # P4: 64/16
        assert feats[1].shape == (2, na, 2, 2, no)  # P5: 64/32
        assert z.shape == (2, na * (16 + 4), no)

    def test_train_mode_batchstats(self, res10):
        m, variables = res10
        x = jnp.zeros((1, 64, 64, 3))
        out, updates = m.module.apply(
            variables, x, training=True, mutable=["batch_stats"]
        )
        assert isinstance(out, list) and len(out) == 2
        assert "batch_stats" in updates

    def test_event_mode_input(self, res10):
        m, variables = res10
        t = m.snn.time_window
        x = jnp.zeros((2, t, 64, 64, 3))  # [N,T,H,W,C] pre-voxelized events
        z, feats = m.apply(variables, x, training=False)
        assert feats[0].shape[0] == 2

    def test_obj_bias_initialized(self, res10):
        m, variables = res10
        head = variables["params"][f"layers_{m.head['index']}"]
        b = np.asarray(head["m0"]["conv"]["bias"]).reshape(3, 18)
        # obj bias should be strongly negative (log prior)
        assert b[:, 4].mean() < -2
        assert b[:, 5:].mean() < -2

    def test_finite_outputs(self, res10):
        m, variables = res10
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3), dtype=jnp.float32
        )
        z, _ = m.apply(variables, x, training=False)
        assert bool(jnp.isfinite(z).all())
