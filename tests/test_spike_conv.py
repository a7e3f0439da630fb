"""int8 spike transport (nn/spike_conv.py) — exactness and wiring.

The int8 round-trip of a binary tensor is exact, so forward values AND
gradients must equal the plain conv bit-for-bit; the knob must not change
the parameter tree (checkpoints are knob-agnostic).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ecs_yolo_tpu.nn.spike_conv import binary_input_conv


def _plain(s, k, strides, padding, fgc=1):
    return lax.conv_general_dilated(
        s, k, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=fgc,
    )


class TestBinaryInputConv:
    def _data(self, fgc=1):
        rng = np.random.RandomState(0)
        s = (rng.rand(2, 8, 8, 4) > 0.5).astype(np.float32)
        k = rng.randn(3, 3, 4 // fgc, 8).astype(np.float32) * 0.2
        return jnp.asarray(s), jnp.asarray(k)

    def test_forward_exact(self):
        s, k = self._data()
        pad = ((1, 1), (1, 1))
        np.testing.assert_array_equal(
            binary_input_conv(s, k, (1, 1), pad),
            _plain(s, k, (1, 1), pad),
        )

    def test_gradients_exact(self):
        s, k = self._data()
        pad = ((1, 1), (1, 1))
        dy = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8),
                         jnp.float32)

        def loss8(s, k):
            return jnp.sum(binary_input_conv(s, k, (2, 2), pad) * dy)

        def loss(s, k):
            return jnp.sum(_plain(s, k, (2, 2), pad) * dy)

        g8 = jax.grad(loss8, argnums=(0, 1))(s, k)
        g = jax.grad(loss, argnums=(0, 1))(s, k)
        np.testing.assert_array_equal(g8[0], g[0])
        np.testing.assert_array_equal(g8[1], g[1])

    def test_depthwise_grouping(self):
        s, _ = self._data()
        rng = np.random.RandomState(2)
        k = jnp.asarray(rng.randn(3, 3, 1, 4).astype(np.float32))
        pad = ((1, 1), (1, 1))
        np.testing.assert_array_equal(
            binary_input_conv(s, k, (1, 1), pad,
                              ("NHWC", "HWIO", "NHWC"), 4),
            _plain(s, k, (1, 1), pad, fgc=4),
        )

    def test_bf16_edges(self):
        s, k = self._data()
        s16, k16 = s.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        pad = ((1, 1), (1, 1))

        def loss(s):
            y = binary_input_conv(s, k16, (1, 1), pad)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        ds = jax.grad(loss)(s16)
        assert ds.dtype == jnp.bfloat16


class TestModelKnob:
    def test_train_step_bitwise_and_param_tree(self):
        from ecs_yolo_tpu.config import SNNConfig
        from ecs_yolo_tpu.models.yolo import build_model

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        outs, trees = [], []
        for knob in (False, True):
            model = build_model(
                "resnet10.yaml", nc=2,
                snn=SNNConfig(time_window=2, int8_spike_transport=knob),
            )
            variables = model.init(jax.random.PRNGKey(0), imgsz=64)
            trees.append(jax.tree_util.tree_structure(variables["params"]))

            def fwd(p):
                out, _ = model.module.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, training=True, mutable=["batch_stats"],
                )
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(jnp.square(l)) for l in leaves)

            v, g = jax.value_and_grad(fwd)(variables["params"])
            outs.append((float(v), jax.tree_util.tree_leaves(g)))
        assert trees[0] == trees[1], "knob changed the parameter tree"
        # binary round-trip is exact -> identical loss and grads
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=0)
        for a, b in zip(outs[0][1], outs[1][1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
