"""First-match 2x2 max-pool (nn/pool_vjp.py) — values and tie routing.

The custom pool must equal reduce_window forward everywhere, match its
gradient exactly on tie-free inputs, and route TIE gradients like torch's
MaxPool2d (first maximal element in row-major window order) — the case
that matters for Concat_res2, which pools binary spike tensors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ecs_yolo_tpu.nn.pool_vjp import (
    max_pool22_first,
    max_pool22_first_packed,
)


def _ref_pool(y):
    return nn.max_pool(y, window_shape=(2, 2), strides=(2, 2))


class TestUnpacked:
    def test_forward_matches_reduce_window(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 8, 10, 5), jnp.float32)
        np.testing.assert_array_equal(max_pool22_first(x), _ref_pool(x))

    def test_grad_matches_reduce_window_no_ties(self):
        rng = np.random.RandomState(1)
        # distinct values -> tie-free: both route to the unique argmax
        x = jnp.asarray(
            rng.permutation(3 * 8 * 10 * 5).reshape(3, 8, 10, 5), jnp.float32
        )
        dy = jnp.asarray(rng.randn(3, 4, 5, 5), jnp.float32)

        g1 = jax.grad(lambda x: jnp.sum(max_pool22_first(x) * dy))(x)
        g2 = jax.grad(lambda x: jnp.sum(_ref_pool(x) * dy))(x)
        np.testing.assert_array_equal(g1, g2)

    def test_tie_routing_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(2)
        # binary spikes: ties in every window
        x = (rng.rand(2, 8, 8, 3) > 0.5).astype(np.float32)
        dy = rng.randn(2, 4, 4, 3).astype(np.float32)

        g = jax.grad(
            lambda x: jnp.sum(max_pool22_first(x) * jnp.asarray(dy))
        )(jnp.asarray(x))

        xt = torch.tensor(
            x.transpose(0, 3, 1, 2), requires_grad=True
        )  # NCHW
        out = torch.nn.functional.max_pool2d(xt, 2, 2)
        out.backward(torch.tensor(dy.transpose(0, 3, 1, 2)))
        gt = xt.grad.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(np.asarray(g), gt)


class TestPacked:
    def _pack(self, y):
        # width-pack f=2: [B,H,W,C] -> [B,H,W//2,2C], phase blocks = columns
        from ecs_yolo_tpu.snn.packed_spread import pack_w

        return pack_w(y, 2)

    def test_forward_matches_unpacked_pool(self):
        rng = np.random.RandomState(3)
        y = jnp.asarray(rng.randn(2, 8, 12, 4), jnp.float32)
        np.testing.assert_array_equal(
            max_pool22_first_packed(self._pack(y)), _ref_pool(y)
        )

    def test_tie_routing_matches_torch_through_packing(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(4)
        y = (rng.rand(2, 8, 12, 4) > 0.5).astype(np.float32)
        dy = rng.randn(2, 4, 6, 4).astype(np.float32)

        def loss(y):
            return jnp.sum(
                max_pool22_first_packed(self._pack(y)) * jnp.asarray(dy)
            )

        g = jax.grad(loss)(jnp.asarray(y))

        yt = torch.tensor(y.transpose(0, 3, 1, 2), requires_grad=True)
        out = torch.nn.functional.max_pool2d(yt, 2, 2)
        out.backward(torch.tensor(dy.transpose(0, 3, 1, 2)))
        gt = yt.grad.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(np.asarray(g), gt)
