"""Segment-level width packing (SNNConfig.packed_c64).

The C<=64 stage of an EMS model runs in the width-packed [.., W//2, 2C]
layout (snn/packed_spread.py packers, models/yolo._plan_packing planner).
The packed path must be EXACTLY the same math with the SAME parameter tree:
checkpoints, the torch importer and fuse_conv_bn are all layout-agnostic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model, _plan_packing, parse_model, load_cfg
from ecs_yolo_tpu.snn.packed_spread import (
    pack_conv_kernel,
    pack_exit_kernel,
    pack_stem_kernel,
    pack_w,
    unpack_w,
)


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestKernelPackers:
    """Each packer must reproduce the original conv exactly (fp32)."""

    def _ref(self, x, k, s):
        r = k.shape[1] // 2
        return _conv(x, k, (s, s), [(k.shape[0] // 2,) * 2, (r, r)])

    @pytest.mark.parametrize("kw,s", [(3, 1), (1, 1), (3, 2)])
    def test_pack_conv_kernel(self, kw, s):
        f, ci, co, H, W = 2, 3, 5, 4, 8
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
        k = jnp.asarray(rng.randn(kw, kw, ci, co), jnp.float32)
        want = self._ref(x, k, s)
        K, ws, wpad = pack_conv_kernel(k, f, s)
        got = _conv(pack_w(x, f), K, (s, ws), [(kw // 2,) * 2, wpad])
        np.testing.assert_allclose(
            np.asarray(unpack_w(got, f)), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("kw", [3, 1])
    def test_pack_exit_kernel(self, kw):
        f, ci, co, H, W = 2, 3, 5, 4, 8
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
        k = jnp.asarray(rng.randn(kw, kw, ci, co), jnp.float32)
        want = self._ref(x, k, 2)  # stride-2 centered conv
        K, ws, wpad = pack_exit_kernel(k, f)
        got = _conv(pack_w(x, f), K, (2, ws), [(kw // 2,) * 2, wpad])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("kw,s", [(7, 2), (3, 2), (3, 1)])
    def test_pack_stem_kernel(self, kw, s):
        f, ci, co, H, W = 2, 3, 4, 8, 16
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
        k = jnp.asarray(rng.randn(kw, kw, ci, co), jnp.float32)
        want = self._ref(x, k, s)
        K, ws, wpad = pack_stem_kernel(k, f, s)
        got = _conv(x, K, (s, ws), [(kw // 2,) * 2, wpad])
        np.testing.assert_allclose(
            np.asarray(unpack_w(got, f)), np.asarray(want), rtol=1e-4, atol=1e-4
        )


class TestPlanner:
    def test_res34_plan(self):
        d = load_cfg("resnet34.yaml")
        spec, _, chs, _ = parse_model(d, 3)
        plan = _plan_packing(spec, chs, True)
        # stem packs, L1/L2 stay packed, L3 (c2=128, s=2) is the free exit
        assert plan[0] == (1, 2)
        assert plan[1] == (2, 2) and plan[2] == (2, 2)
        assert plan[3] == (2, 1)
        assert all(p == (1, 1) for p in plan[4:])

    def test_disabled(self):
        d = load_cfg("resnet34.yaml")
        spec, _, chs, _ = parse_model(d, 3)
        assert all(p == (1, 1) for p in _plan_packing(spec, chs, False))

    def test_res10_plan(self):
        # res10: stem + BasicBlock_2 stay packed; the first Concat_res2
        # (c 64->128, s2) is the exit (its conv1 consumes packed, the
        # channel-concat shortcut pools each piece packed)
        d = load_cfg("resnet10.yaml")
        spec, _, chs, _ = parse_model(d, 3)
        plan = _plan_packing(spec, chs, True)
        assert plan[0] == (1, 2) and plan[1] == (2, 2) and plan[2] == (2, 1)
        assert all(p == (1, 1) for p in plan[3:])
        for (f, n, name, args), (f_in, f_out) in zip(spec, plan):
            if f_out > 1:
                assert name in ("Conv_1", "BasicBlock_2")


class TestModelParity:
    """Full-model equivalence: packed vs unpacked with the SAME variables."""

    @pytest.fixture(scope="class")
    def models(self):
        mp = build_model("resnet34.yaml", nc=13, snn=SNNConfig(packed_c64=True))
        mu = build_model("resnet34.yaml", nc=13, snn=SNNConfig(packed_c64=False))
        v = mp.init(jax.random.PRNGKey(0), imgsz=32)
        return mp, mu, v

    def test_param_tree_identical(self, models):
        mp, mu, v = models
        vu = mu.init(jax.random.PRNGKey(0), imgsz=32)
        kp = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        ku = jax.tree_util.tree_flatten_with_path(vu["params"])[0]
        assert [(jax.tree_util.keystr(k), x.shape) for k, x in kp] == [
            (jax.tree_util.keystr(k), x.shape) for k, x in ku
        ]
        for (_, a), (_, b) in zip(kp, ku):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_forward_exact(self, models):
        mp, mu, v = models
        x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
        zp, _ = mp.module.apply(v, x, training=False)
        zu, _ = mu.module.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(zp), np.asarray(zu), rtol=1e-5, atol=1e-4
        )

    def test_train_stats_and_grads_x64(self, models):
        """Training-mode parity in float64.

        In fp32 the packed path's (mathematically exact) reassociation of
        BN statistics shifts membranes by ~1 ulp, which can FLIP individual
        spikes at the Heaviside threshold and cascade through downstream
        layers — inherent to any reordering in a spiking net, not an error
        of the packing.  fp64 puts the noise ~1e-15, far below any
        threshold crossing, so stats and gradients must agree tightly.
        """
        mp, mu, v32 = models
        with jax.enable_x64():
            v = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64)
                if a.dtype == jnp.float32 else a, v32
            )
            x = jnp.asarray(
                np.random.RandomState(3).rand(1, 32, 32, 3), jnp.float64
            )

            def loss(m):
                def f(params):
                    out, st = m.module.apply(
                        {"params": params, "batch_stats": v["batch_stats"]},
                        x,
                        training=True,
                        mutable=["batch_stats", "spike_stats"],
                    )
                    return (
                        sum(
                            jnp.mean(jnp.square(l))
                            for l in jax.tree_util.tree_leaves(out)
                        ),
                        st["batch_stats"],
                    )

                return jax.value_and_grad(f, has_aux=True)(v["params"])

            (lp, bsp), gp = loss(mp)
            (lu, bsu), gu = loss(mu)
            np.testing.assert_allclose(float(lp), float(lu), rtol=1e-10)
            for a, b in zip(
                jax.tree_util.tree_leaves(bsp), jax.tree_util.tree_leaves(bsu)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
                )
            for a, b in zip(
                jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gu)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
                )

    def test_res10_eval_exact(self):
        # exercises the Concat_res2 exit path (packed conv1 + packed-pooled
        # channel-concat shortcut)
        mp = build_model("resnet10.yaml", nc=13, snn=SNNConfig(packed_c64=True))
        mu = build_model("resnet10.yaml", nc=13, snn=SNNConfig(packed_c64=False))
        v = mp.init(jax.random.PRNGKey(0), imgsz=32)
        x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3), jnp.float32)
        zp, _ = mp.module.apply(v, x, training=False)
        zu, _ = mu.module.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(zp), np.asarray(zu), rtol=1e-5, atol=1e-4
        )

    def test_rect_input(self, models):
        # non-square letterboxed shapes must work packed
        mp, mu, v = models
        x = jnp.asarray(np.random.RandomState(4).rand(1, 32, 64, 3), jnp.float32)
        zp, _ = mp.module.apply(v, x, training=False)
        zu, _ = mu.module.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(zp), np.asarray(zu), rtol=1e-5, atol=1e-4
        )
