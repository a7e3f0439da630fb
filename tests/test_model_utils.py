"""Tests for fuse/info/autobatch/TTA utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.models.utils import (
    fuse_conv_bn,
    count_params,
    model_info,
    autobatch,
    forward_augment,
)


@pytest.fixture(scope="module")
def model():
    m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


class TestFuse:
    def test_fused_output_matches(self, model):
        m, v = model
        # perturb batch stats so the fuse actually does something
        import flax

        stats = flax.core.unfreeze(v["batch_stats"])
        rng = np.random.RandomState(0)

        def jitter(path, leaf):
            return jnp.asarray(
                np.abs(rng.rand(*leaf.shape)).astype(np.float32) + 0.5
            )

        stats = jax.tree_util.tree_map_with_path(jitter, stats)
        v2 = {"params": v["params"], "batch_stats": stats}

        x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
        z0, _ = m.apply(v2, x, training=False)
        fused = fuse_conv_bn(v2)
        z1, _ = m.apply(fused, x, training=False)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=2e-2)

    def test_fused_bn_is_neutral(self, model):
        _, v = model
        fused = fuse_conv_bn(v)
        stats = fused["batch_stats"]
        leaf = jax.tree_util.tree_leaves(stats)
        # all means 0 (or vars ~1) after fusing
        means = [x for x in leaf if float(jnp.abs(x).max()) < 1e-6]
        assert means  # at least some zeroed means exist


def test_count_params(model):
    _, v = model
    n = count_params(v["params"])
    assert 5e6 < n < 50e6  # EMS-Res10 scale


def test_model_info(model):
    m, v = model
    info = model_info(m, v, imgsz=64)
    assert info["params"] > 1e6
    assert info["gflops"] > 0


def test_autobatch(model):
    m, v = model
    b = autobatch(m, v, imgsz=64, device_bytes=8 * 2**30)
    assert b >= 1


def test_forward_augment(model):
    m, v = model
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    z = forward_augment(m, v, x)
    assert z.ndim == 3 and z.shape[-1] == 2 + 5
    assert bool(jnp.isfinite(z).all())
