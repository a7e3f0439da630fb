"""Unit tests for the final tail slice (nn/blocks_tail2.py, blocks_star.py
round-2 additions): shapes, oracles vs torch where applicable, and the
structural guarantees of the TPU re-designs (HetConv masking, AKConv
zero-offset start)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.nn import blocks_tail2 as T2
from ecs_yolo_tpu.nn import blocks_star as ST

SNN = SNNConfig(time_window=2)
KEY = jax.random.PRNGKey(0)


def rnd(*shape):
    return jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)


def run(mod, x, **kw):
    y, variables = mod.init_with_output(KEY, x, **kw)
    return y, variables


class TestSimpleWrappers:
    def test_gn_matches_torch(self):
        import torch

        x = rnd(2, 1, 4, 4, 8)
        y, _ = run(T2.GN(num_groups=4), x)
        # torch GroupNorm over [T*N, C, H, W]
        xt = torch.tensor(
            np.asarray(x).reshape(2, 4, 4, 8).transpose(0, 3, 1, 2)
        )
        yt = torch.nn.GroupNorm(4, 8)(xt).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y).reshape(2, 4, 4, 8).transpose(0, 3, 1, 2),
            yt, rtol=1e-4, atol=1e-5,
        )

    def test_tprelu_matches_torch(self):
        import torch

        x = rnd(2, 1, 3, 3, 5)
        y, _ = run(T2.TPReLU(), x)
        xt = torch.tensor(np.asarray(x).reshape(2, 3, 3, 5).transpose(0, 3, 1, 2))
        yt = torch.nn.PReLU(5)(xt).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(y).reshape(2, 3, 3, 5), yt, rtol=1e-5, atol=1e-6
        )

    def test_clipped_tprelu(self):
        x = jnp.array([[-2.0, 0.5, 10.0]])[None, None, None]
        y, _ = run(ST.ClippedTPReLU(), x)
        np.testing.assert_allclose(
            np.asarray(y).ravel(), [-0.5, 0.5, 6.0], rtol=1e-6
        )


class TestAdaptivePool:
    @pytest.mark.parametrize("hw,out", [(6, 3), (7, 3), (5, 2)])
    def test_matches_torch(self, hw, out):
        import torch
        import torch.nn.functional as F

        x = rnd(2, 3, hw, hw, 4)  # treat [2,3] as leading dims
        y = T2.adaptive_avg_pool_hw(x, out)
        xt = torch.tensor(
            np.asarray(x).reshape(6, hw, hw, 4).transpose(0, 3, 1, 2)
        )
        yt = F.adaptive_avg_pool2d(xt, out).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(y).reshape(6, out, out, 4), yt, rtol=1e-5, atol=1e-6
        )


class TestHetConv:
    def test_shape_and_mask_structure(self):
        c1, c2, p = 8, 6, 4
        mask = T2._hetconv_mask(c1, c2, p)
        assert mask.shape == (c2, c1)
        # every output row sees exactly c1//p 3x3 taps
        np.testing.assert_array_equal(np.asarray(mask).sum(1), c1 // p)
        # rows are successive right-rotations
        m = np.asarray(mask)
        for k in range(1, c2):
            np.testing.assert_array_equal(m[k], np.roll(m[k - 1], 1))

        x = rnd(2, 1, 6, 6, c1)
        y, _ = run(T2.HetConv(c2, s=1, p=p, snn=SNN), x)
        assert y.shape == (2, 1, 6, 6, c2)

    def test_off_center_taps_inert_for_1x1_pairs(self):
        """Perturbing an off-center 3x3 tap of a pair the mask marks as 1x1
        must not change the output — the defining HetConv property."""
        c1, c2, p = 4, 4, 2
        x = rnd(1, 1, 5, 5, c1)
        mod = T2.HetConv(c2, s=1, p=p, snn=SNN)
        y0, variables = run(mod, x)
        mask = np.asarray(T2._hetconv_mask(c1, c2, p))
        oi = np.argwhere(mask == 0)[0]  # (out, in) pair using a 1x1 kernel
        w = variables["params"]["w3"]
        w = w.at[0, 0, oi[1], oi[0]].add(100.0)  # corner tap
        y1 = mod.apply({"params": {**variables["params"], "w3": w}}, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


class TestAKConv:
    def test_zero_offset_start_and_shape(self):
        """p_conv weights are zero-initialized, so at init the sampling grid
        is the static base grid — output must be finite and offset-free
        (gradient path still exists through the conv)."""
        x = rnd(2, 1, 8, 8, 6)
        mod = T2.AKConv(10, num_param=5, s=1, snn=SNN)
        y, variables = run(mod, x)
        assert y.shape == (2, 1, 8, 8, 10)
        assert np.isfinite(np.asarray(y)).all()
        assert np.count_nonzero(
            variables["params"]["p_conv"]["conv"]["kernel"]
        ) == 0

    def test_stride(self):
        x = rnd(2, 1, 8, 8, 4)
        y, _ = run(T2.AKConv(8, num_param=4, s=2, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 8)


class TestAttentionTail:
    def test_attention_shape(self):
        x = rnd(2, 1, 4, 4, 16)
        y, _ = run(T2.Attention(num_heads=4, snn=SNN), x, training=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.parametrize("sr", [1, 2])
    def test_osra_shape(self, sr):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(
            T2.OSRAAttention(num_heads=2, sr_ratio=sr, snn=SNN), x,
            training=False,
        )
        assert y.shape == x.shape

    def test_dynamic_conv(self):
        x = rnd(2, 1, 6, 6, 8)
        y, _ = run(T2.DynamicConv2d(3, 4, 2, snn=SNN), x, training=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_dmixer(self):
        x = rnd(2, 1, 6, 6, 8)
        y, _ = run(
            T2.TransxnetHybridTokenMixer(num_groups=2, snn=SNN), x,
            training=False,
        )
        assert y.shape == x.shape


class TestC2fHybrids:
    @pytest.mark.parametrize(
        "cls,kw",
        [
            (T2.BasicBlock_2C2f, dict(s=1)),
            (T2.BasicBlock_2C2f, dict(s=2)),
            (T2.BasicBlock_1C2f, dict(s=1)),
            (T2.Concat_res2C2f, dict(s=1)),
        ],
    )
    def test_shapes(self, cls, kw):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(cls(16, n=2, snn=SNN, **kw), x)
        hw = 4 if kw.get("s") == 2 else 8
        assert y.shape == (2, 1, hw, hw, 16)

    def test_star_c2f(self):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(ST.StarBlock_2C2f(16, n=1, k=3, s=2, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 16)


class TestBasicBlock1Variants:
    """BasicBlock_1n (pre-BN entry, no final BN, reference :1082) and
    BasicBlock_1m (RepConv entry, reference :1117)."""

    @pytest.mark.parametrize("cls", [T2.BasicBlock_1n, T2.BasicBlock_1m])
    @pytest.mark.parametrize("s", [1, 2])
    def test_shapes(self, cls, s):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(cls(16, s=s, snn=SNN), x)
        hw = 8 // s
        assert y.shape == (2, 1, hw, hw, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_1n_identity_shortcut_has_no_sc_params(self):
        x = rnd(2, 1, 4, 4, 16)
        _, v = run(T2.BasicBlock_1n(16, s=1, snn=SNN), x)
        assert not any(k.startswith("sc_") for k in v["params"])

    def test_1m_uses_repconv_double_branch(self):
        x = rnd(2, 1, 4, 4, 8)
        _, v = run(T2.BasicBlock_1m(16, s=1, snn=SNN), x)
        rep = v["params"]["rep"]
        assert "conv1" in rep and "conv2" in rep  # 3x3 + 1x1 branches


class TestStarFamily:
    @pytest.mark.parametrize("cls", [ST.StarBlock_4, ST.StarBlock_5])
    def test_downsample(self, cls):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(cls(16, 3, 2, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 16)

    @pytest.mark.parametrize("cls", [ST.StarSConv, ST.MStarBlock, ST.MStarBlock_2])
    def test_starconv_variants(self, cls):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(cls(16, 3, 2, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 16)

    def test_identity_residual_path(self):
        x = rnd(2, 1, 8, 8, 8)
        y, _ = run(ST.MStarBlock_2(8, 3, 1, snn=SNN), x)
        assert y.shape == x.shape


class TestResNetLayers:
    def test_stem(self):
        x = rnd(2, 1, 16, 16, 3)
        y, _ = run(T2.ResNetLayerBasic(32, is_first=True, snn=SNN), x)
        assert y.shape == (2, 1, 8, 8, 32)

    def test_ghost_stage(self):
        x = rnd(2, 1, 8, 8, 16)
        y, _ = run(T2.ResNetLayerBasic(32, 3, 2, False, 2, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 32)

    def test_bo_stem_pools(self):
        x = rnd(2, 1, 16, 16, 3)
        y, _ = run(T2.ResNetLayerBo(32, is_first=True, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 32)  # stride-2 conv + stride-2 pool

    def test_resnet_block(self):
        x = rnd(2, 1, 8, 8, 16)
        y, _ = run(T2.ResNetBlock(8, s=2, e=4, snn=SNN), x)
        assert y.shape == (2, 1, 4, 4, 32)
