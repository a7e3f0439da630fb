"""Fused Pallas kernels vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import lif_scan, ecs_lif_scan
from ecs_yolo_tpu.snn.pallas_kernels import lif_fused, ecs_lif_fused

CFG = SNNConfig()


class TestLIFFused:
    @pytest.mark.parametrize("act", [False, True])
    def test_matches_scan(self, act):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 2, 9, 10, 7).astype(np.float32))
        want = np.asarray(lif_scan(x, CFG, act=act))
        got = np.asarray(lif_fused(x, CFG, act=act, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nonaligned_size(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 3, 5, 7, 3).astype(np.float32))
        want = np.asarray(lif_scan(x, CFG))
        got = np.asarray(lif_fused(x, CFG, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestECSFused:
    def _params(self, c, seed=0):
        rng = np.random.RandomState(seed)
        dw = (rng.randn(3, 3, 1, c) * 0.2).astype(np.float32)
        dwb = (rng.randn(c) * 0.1).astype(np.float32)
        pw = (rng.randn(1, 1, c, c) * 0.2).astype(np.float32)
        pwb = (rng.randn(c) * 0.1).astype(np.float32)
        return dw, dwb, pw, pwb

    def _scan_ref(self, x, dw, dwb, pw, pwb, act):
        c = x.shape[-1]

        def spread(s):
            d = jax.lax.conv_general_dilated(
                s, jnp.asarray(dw), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            ) + dwb
            return jax.lax.conv_general_dilated(
                d, jnp.asarray(pw), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pwb

        return ecs_lif_scan(x, spread, CFG, act=act)

    @pytest.mark.parametrize("act", [True, False])
    def test_matches_scan_single_block(self, act):
        # H small enough for one row block: halo logic exercised at edges
        rng = np.random.RandomState(2)
        t, n, h, w, c = 4, 1, 8, 6, 4
        x = jnp.asarray((rng.randn(t, n, h, w, c) * 0.7).astype(np.float32))
        dw, dwb, pw, pwb = self._params(c)
        want = np.asarray(self._scan_ref(x, dw, dwb, pw, pwb, act))
        got = np.asarray(
            ecs_lif_fused(
                x, jnp.asarray(dw), jnp.asarray(dwb), jnp.asarray(pw),
                jnp.asarray(pwb), CFG, act=act, interpret=True,
            )
        )
        if act:
            np.testing.assert_allclose(got, want, atol=2e-4)
        else:
            assert np.mean(got != want) < 0.02  # heaviside boundary flips

    def test_matches_scan_multi_block(self, monkeypatch):
        # force several row blocks so the halo-recompute path is exercised
        import ecs_yolo_tpu.snn.pallas_kernels as pk

        monkeypatch.setattr(pk, "_pick_block_rows", lambda *a, **k: 8)
        rng = np.random.RandomState(3)
        t, n, h, w, c = 4, 2, 29, 6, 4
        x = jnp.asarray((rng.randn(t, n, h, w, c) * 0.7).astype(np.float32))
        dw, dwb, pw, pwb = self._params(c, seed=4)
        want = np.asarray(self._scan_ref(x, dw, dwb, pw, pwb, True))
        got = np.asarray(
            pk.ecs_lif_fused(
                x, jnp.asarray(dw), jnp.asarray(dwb), jnp.asarray(pw),
                jnp.asarray(pwb), CFG, act=True, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_ecs_fused_v2_matches_scan():
    """v2 (scratch-state) kernel parity in interpret mode."""
    from ecs_yolo_tpu.snn.pallas_kernels import ecs_lif_fused_v2

    rng = np.random.RandomState(5)
    t, n, h, w, c = 4, 2, 29, 6, 4
    x = jnp.asarray((rng.randn(t, n, h, w, c) * 0.7).astype(np.float32))
    helper = TestECSFused()
    dw, dwb, pw, pwb = helper._params(c, seed=6)
    want = np.asarray(helper._scan_ref(x, dw, dwb, pw, pwb, True))
    got = np.asarray(
        ecs_lif_fused_v2(
            x, jnp.asarray(dw), jnp.asarray(dwb), jnp.asarray(pw),
            jnp.asarray(pwb), CFG, act=True, interpret=True, block_rows=8,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


class TestEcsV3:
    """Fused per-tile T-loop kernel (snn/pallas_ecs_v3.py) — interpret-mode
    exact parity with the XLA scan, including row-tile halo boundaries."""

    @pytest.mark.parametrize("shape", [(4, 2, 16, 24, 8), (5, 1, 32, 16, 8)])
    def test_matches_scan(self, shape):
        from ecs_yolo_tpu.snn.pallas_ecs_v3 import ecs_lif_pallas

        T, N, H, W, C = shape
        cfg = SNNConfig(time_window=T)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*shape) * 2 - 0.5, jnp.float32)
        dwk = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.4, jnp.float32)
        dwb = jnp.asarray((rng.rand(C) - 0.5) * 0.2, jnp.float32)
        pwk = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.2, jnp.float32)
        pwb = jnp.asarray((rng.rand(C) - 0.5) * 0.2, jnp.float32)

        def spread(s):
            d = jax.lax.conv_general_dilated(
                s, dwk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + dwb
            return jax.lax.conv_general_dilated(
                d, pwk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pwb

        ya = np.asarray(ecs_lif_scan(x, spread, cfg, act=False))
        yp = np.asarray(ecs_lif_pallas(x, dwk, dwb, pwk, pwb, cfg,
                                       act=False, interpret=True))
        np.testing.assert_array_equal(ya, yp)


class TestRound5SpreadKernels:
    """Opt-in round-5 kernels (snn/pallas_dw.py): parity in interpret mode.
    Both are measured SLOWER than XLA on v5e (docs/DESIGN.md round-5) and
    default OFF; these tests keep them correct for future Mosaic work."""

    def test_binary_dw3_conv_matches_xla(self):
        import jax.numpy as jnp
        from jax import lax
        from ecs_yolo_tpu.snn.pallas_dw import binary_dw3_conv

        rng = np.random.RandomState(0)
        N, H, W, C = 2, 16, 8, 128
        s = jnp.asarray((rng.rand(N, H, W, C) > 0.7), jnp.float32)
        k = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, jnp.float32)
        b = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.float32)
        ref = lax.conv_general_dilated(
            s, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + b
        got = binary_dw3_conv(s, k, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        # grads flow and match AD of the XLA conv
        g1 = jax.grad(lambda s_: jnp.sum(jnp.square(
            binary_dw3_conv(s_, k, b))))(s)
        g2 = jax.grad(lambda s_: jnp.sum(jnp.square(
            lax.conv_general_dilated(
                s_, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C) + b)))(s)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

    def test_packed_spread_pallas_matches_composite(self):
        import jax.numpy as jnp
        from jax import lax
        from ecs_yolo_tpu.snn.pallas_dw import packed_spread_pallas
        from ecs_yolo_tpu.snn.packed_spread import build_packed_spread

        rng = np.random.RandomState(1)
        N, H, Wp, C = 2, 16, 8, 64
        s = jnp.asarray((rng.rand(N, H, Wp, 2 * C) > 0.7), jnp.float32)
        dw = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, jnp.float32)
        dwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.float32)
        pw = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.05, jnp.float32)
        pwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.float32)

        def composite(s_, dw_, dwb_, pw_, pwb_):
            kp, bp = build_packed_spread(dw_, dwb_, pw_, pwb_, 2)
            return lax.conv_general_dilated(
                s_, kp, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bp

        ref = composite(s, dw, dwb, pw, pwb)
        got = packed_spread_pallas(s, dw, dwb, pw, pwb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

        # all five gradients match the composite formulation's AD
        gp = jax.grad(
            lambda *a: jnp.sum(jnp.square(packed_spread_pallas(*a))),
            argnums=(0, 1, 2, 3, 4))(s, dw, dwb, pw, pwb)
        gr = jax.grad(
            lambda *a: jnp.sum(jnp.square(composite(*a))),
            argnums=(0, 1, 2, 3, 4))(s, dw, dwb, pw, pwb)
        for a, b_, nm in zip(gp, gr, ["ds", "ddw", "ddwb", "dpw", "dpwb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6,
                err_msg=nm)

    def test_model_knob_packed_spread(self):
        """SNNConfig.pallas_packed_spread through the full res10 graph
        (packed stage) matches the composite default to bf16-free fp32
        tolerance; param tree unchanged."""
        from ecs_yolo_tpu.config import SNNConfig
        from ecs_yolo_tpu.models.yolo import build_model
        import jax.numpy as jnp

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        outs, trees = [], []
        for knob in (False, True):
            model = build_model(
                "resnet10.yaml", nc=2,
                snn=SNNConfig(time_window=2, pallas_packed_spread=knob),
            )
            variables = model.init(jax.random.PRNGKey(0), imgsz=64)
            trees.append(jax.tree_util.tree_structure(variables["params"]))
            out, _ = model.module.apply(
                variables, x, training=True, mutable=["batch_stats"])
            outs.append(np.concatenate(
                [np.asarray(l).ravel()
                 for l in jax.tree_util.tree_leaves(out)]))
        assert trees[0] == trees[1]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)
