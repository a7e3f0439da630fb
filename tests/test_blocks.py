"""Every registered block constructs, initializes, and runs forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import C2_BLOCKS, PASS_BLOCKS, EXTRA_BLOCKS
from ecs_yolo_tpu.nn import blocks_ext as BX

SNN = SNNConfig(time_window=2)  # T=2 keeps CPU tests quick
KEY = jax.random.PRNGKey(0)

T, N, H, W, C = 2, 1, 8, 8, 16
X = jnp.asarray(np.random.RandomState(0).randn(T, N, H, W, C) * 0.5, jnp.float32)

# block name -> (args, expected out channels or None)
SINGLE_INPUT = {
    "Conv": ((24, 3, 1), 24),
    "Conv_A": ((24, 3, 1), 24),
    "Conv_B": ((24, 3), 24),
    "Conv_1": ((24, 3, 2), 24),
    "Conv_2": ((24, 3, 1), 24),
    "Conv_3": ((24,), 24),
    "Conv_4": ((24,), 24),
    "Conv_5": ((24, 3), 24),
    "Conv_6": ((24, 3), 24),
    "BasicBlock": ((24, 3, 1), 24),
    "BasicBlock_1": ((24, 1), 24),
    "BasicBlock_2": ((24, 3, 2), 24),
    "Concat_res2": ((24, 3, 2), 24),
    "shortcut": ((24, 2), 24),
    "DepthWiseConv": ((24, 3, 1, 1), 24),
    "DWConv": ((24, 3), 24),
    "LightConv": ((24, 3), 24),
    "Bottleneck": ((16,), 16),
    "BottleneckCSP": ((24, 1), 24),
    "C3": ((24, 1), 24),
    "C3Ghost": ((24, 1), 24),
    "C3SPP": ((24, (3, 5)), 24),
    "C2f": ((24, 1), 24),
    "SPP": ((24,), 24),
    "SPPF": ((24,), 24),
    "Focus": ((24, 1), 24),
    "GhostConv": ((24,), 24),
    "GhostBottleneck": ((24,), 24),
    "GSConv": ((24,), 24),
    "BasicBlock_6": ((24, 3, 1), 24),
    "BasicBlock_1s": ((24, 1), 24),
    "StarBlock_2": ((24, 3, 2), 24),
    "RepConv": ((24,), 24),
    "RepC3": ((24, 1), 24),
    "MHSA": ((16, 4), 16),
    "BottleneckTransformer": ((16, 1, 4), 16),
    "BoT3": ((24, 1), 24),
}

PASS_INPUT = {
    "Sample": ((None, 2, "nearest"), None),
    "Pools": ((3, 2, 1), None),
    "mem_update": ((), None),
    "AIFI": ((64, 4), None),
    "EMA": ((8,), None),
    "DSSA": ((4,), None),
    "SELayer": ((4,), None),
    "Silence": ((), None),
    "FasterNetBlock": ((2,), None),
    "ELA": ((7,), None),
    "CoT": ((3,), None),
    "ScConv": ((16,), None),
    "PartialConv": ((4,), None),
}

TAIL_INPUT = {
    "Bottleneck_1": ((24, 2), 24),
    "Bottleneck_2": ((24, 3, 2), 96),   # out = e*c2
    "Bottleneck_3": ((24, 3, 2), 24),
    "Bottleneck_4": ((24, 3, 2), 24),
    "BasicBlock_3": ((24, 3, 2), 24),
    "BasicBlock_4": ((24, 3, 2), 24),
    "BasicBlock_5": ((24, 3, 2), 24),
    "BasicBlock_ms": ((24, 3, 2), 24),
    "ConcatBlock_ms": ((24, 3, 2), 24),
    "Concat_res3": ((24, 3, 2), 24),
    "Concat_res4": ((24, 3, 2), 24),
    "Concat_res5": ((24, 3, 2), 24),
    "Concat_res6": ((32, 3, 2), 32),
    "DualConv": ((24, 2), 24),
    "MobileNetV3": ((24, 32, 3, 2), 24),
    "C3TR": ((24, 1), 24),
    "TransformerBlock": ((16, 4), 16),
}


@pytest.mark.parametrize("name", sorted(TAIL_INPUT))
def test_tail_block(name):
    args, c_out = TAIL_INPUT[name]
    mod = _make(name, args)
    variables = mod.init(KEY, X, training=False)
    y = mod.apply(variables, X, training=False)
    assert y.shape[0] == T and y.shape[1] == N
    if c_out is not None:
        assert y.shape[-1] == c_out, f"{name}: {y.shape}"
    assert bool(jnp.isfinite(y).all()), name


def test_context_guide_fusion():
    mod = _make("ContextGuideFusionModule", ())
    x1 = jnp.asarray(np.random.RandomState(7).randn(T, N, H, W, 8), jnp.float32)
    v = mod.init(KEY, [X, x1], training=False)
    y = mod.apply(v, [X, x1], training=False)
    assert y.shape[-1] == 16


def test_context_guide_fusion_v2():
    """v2 (reference :1791): EMA gate + shared-conv interaction term."""
    mod = _make("ContextGuideFusionModulev2", ())
    x1 = jnp.asarray(np.random.RandomState(7).randn(T, N, H, W, 8), jnp.float32)
    v = mod.init(KEY, [X, x1], training=False)
    y = mod.apply(v, [X, x1], training=False)
    assert y.shape[-1] == 16
    assert "convs" in v["params"] and "se" in v["params"]
    assert bool(jnp.isfinite(y).all())


def test_hgblock():
    mod = _make("HGBlock", (8, 24, 3, 2))
    v = mod.init(KEY, X, training=False)
    y = mod.apply(v, X, training=False)
    assert y.shape[-1] == 24


def _make(name, args):
    from ecs_yolo_tpu.models.yolo import _construct

    return _construct(name, args, SNN)


@pytest.mark.parametrize("name", sorted(SINGLE_INPUT))
def test_c2_block(name):
    args, c_out = SINGLE_INPUT[name]
    mod = _make(name, args)
    variables = mod.init(KEY, X, training=False)
    y = mod.apply(variables, X, training=False)
    assert y.shape[0] == T and y.shape[1] == N
    if c_out is not None:
        assert y.shape[-1] == c_out, f"{name}: {y.shape}"
    assert bool(jnp.isfinite(y).all()), name

    # training mode with mutable batch stats works too
    y2, _ = mod.apply(variables, X, training=True, mutable=["batch_stats"])
    assert y2.shape == y.shape


@pytest.mark.parametrize("name", sorted(PASS_INPUT))
def test_pass_block(name):
    args, _ = PASS_INPUT[name]
    mod = _make(name, args)
    variables = mod.init(KEY, X, training=False)
    y = mod.apply(variables, X, training=False)
    assert y.shape[-1] == C or name == "Sample"
    assert bool(jnp.isfinite(y).all()), name


def test_contract_expand_roundtrip():
    c = _make("Contract", (2,))
    e = _make("Expand", (2,))
    vc = c.init(KEY, X, training=False)
    y = c.apply(vc, X, training=False)
    assert y.shape == (T, N, H // 2, W // 2, C * 4)
    ve = e.init(KEY, y, training=False)
    z = e.apply(ve, y, training=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(X))


def test_asff2():
    x0 = X  # deep level (smaller spatially in practice)
    x1 = jnp.asarray(
        np.random.RandomState(1).randn(T, N, H * 2, W * 2, 8), jnp.float32
    )
    mod = _make("ASFF2", (0,))
    v = mod.init(KEY, [x0, x1], training=False)
    y = mod.apply(v, [x0, x1], training=False)
    assert y.shape == (T, N, H, W, C)

    mod1 = _make("ASFF2", (1,))
    v1 = mod1.init(KEY, [x0, x1], training=False)
    y1 = mod1.apply(v1, [x0, x1], training=False)
    assert y1.shape == (T, N, H * 2, W * 2, 8)


def test_asff3():
    x0 = X
    x1 = jnp.asarray(np.random.RandomState(1).randn(T, N, 16, 16, 8), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(2).randn(T, N, 32, 32, 4), jnp.float32)
    for level, want in [(0, (T, N, 8, 8, C)), (1, (T, N, 16, 16, 8)),
                        (2, (T, N, 32, 32, 4))]:
        mod = _make("ASFF3", (level,))
        v = mod.init(KEY, [x0, x1, x2], training=False)
        y = mod.apply(v, [x0, x1, x2], training=False)
        assert y.shape == want, (level, y.shape)


def test_cblinear_cbfuse():
    lin = _make("CBLinear", ((8, 8),))
    v = lin.init(KEY, X, training=False)
    ys = lin.apply(v, X, training=False)
    assert len(ys) == 2 and ys[0].shape[-1] == 8

    fuse = _make("CBFuse", ((0,),))
    small = jnp.asarray(np.zeros((T, N, 4, 4, 8)), jnp.float32)
    vf = fuse.init(KEY, [ys, small], training=False)
    out = fuse.apply(vf, [ys, small], training=False)
    assert out.shape == small.shape


def test_gsconv_shuffle_deinterleaves():
    """GSConv output channel order must be [even inputs..., odd inputs...]."""
    mod = _make("GSConv", ((8,)))
    v = mod.init(KEY, X, training=False)
    y = mod.apply(v, X, training=False)
    assert y.shape[-1] == 8


STAR_INPUT = {
    "StarBlock": ((24, 3, 2), 24),
    "StarBlock_1": ((24, 3, 2), 24),
    "StarBlock_1s": ((24, 3, 2), 24),
    "StarBlock_3": ((24, 3, 2), 24),
    "MStarBlock": ((16, 3, 1), 16),
}


@pytest.mark.parametrize("name", sorted(STAR_INPUT))
def test_star_block(name):
    args, c_out = STAR_INPUT[name]
    mod = _make(name, args)
    variables = mod.init(KEY, X, training=False)
    y = mod.apply(variables, X, training=False)
    assert y.shape[-1] == c_out, f"{name}: {y.shape}"
    assert bool(jnp.isfinite(y).all()), name
