"""Extended block library: CSP/star/transformer/attention families.

Covers the reference's wider block set reachable from shipped YAMLs and the
parse_model registry (SURVEY.md §2.2): GSConv/BasicBlock_6/_1s (slim-neck),
StarNet blocks, RepConv/RepC3 + AIFI (RT-DETR), MHSA/BoT3 (BoTNet), EMA
attention, ASFF fusion, DSSA spike-driven attention, and the YOLOv5 CSP tail
(Bottleneck/C3/C2f/SPP/SPPF/Focus/Ghost).  File:line cites refer to
reference models/common.py unless noted.

Design notes (TPU-first deviations):
* neuron activations on non-image token/attention tensors use plain LIF
  (no ECS spread): the reference's ``mem_update`` on those shapes either
  crashes or builds a meaningless conv over attention axes — see
  models/common2.py:530-533 where the "time" loop runs over t*b.
* SPP's MaxPool3d(k) in the reference pools over the CHANNEL axis too
  (models/common.py:2370); here pooling is spatial-only (the SPP intent).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN, autopad
from ..snn.neuron import lif_scan
from .blocks import (
    SnnConv,
    TBatchNorm,
    MemUpdate,
    Conv,
    Conv_2,
    Conv_3,
    Conv_4,
    Conv_5,
    Conv_6,
    DepthWiseConv,
    Shortcut,
    fold_t,
    unfold_t,
    max_pool_t,
)
from .initializers import torch_conv_kernel_init


def spatial_max_pool_same(x, k: int):
    """Per-timestep spatial max pool, stride 1, 'same' padding."""
    y, t = fold_t(x)
    p = k // 2
    y = nn.max_pool(
        y, window_shape=(k, k), strides=(1, 1), padding=[(p, p), (p, p)]
    )
    return unfold_t(y, t)


def interpolate_nearest(x, factor: int):
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


# ---------------------------------------------------------------------------
# CSP family (reference :2143-2500)
# ---------------------------------------------------------------------------


class DWConv(nn.Module):
    """Depthwise Conv_3 (g = gcd(c1, c2)), reference :2164."""

    c2: int
    k: int = 1
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv_3(self.c2, self.k, self.s, g=g, snn=self.snn, name="conv")(
            x, training
        )


class LightConv(nn.Module):
    """1x1 Conv_3 then depthwise (reference :2143)."""

    c2: int
    k: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv_3(self.c2, 1, snn=self.snn, name="conv1")(x, training)
        return DWConv(self.c2, self.k, snn=self.snn, name="conv2")(y, training)


class Bottleneck(nn.Module):
    """Standard bottleneck: Conv_3 -> Conv_4 (+residual), reference :2173."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv_3(c_, self.k[0], 1, snn=self.snn, name="cv1")(x, training)
        y = Conv_4(self.c2, self.k[1], 1, g=self.g, snn=self.snn, name="cv2")(
            y, training
        )
        return x + y if (self.shortcut and c1 == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck (reference :2194)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, snn=self.snn,
                            name=f"m{i}")(y1, training)
        y1 = SnnConv(c_, 1, 1, name="cv3")(y1)
        y2 = SnnConv(c_, 1, 1, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = TBatchNorm(1.0, self.snn, name="bn")(y, training)
        y = jax.nn.silu(y)
        return Conv_3(self.c2, 1, 1, snn=self.snn, name="cv4")(y, training)


class C3(nn.Module):
    """CSP with 3 convs (reference :2239)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    def inner(self, c_):
        return [
            (f"m{i}", Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0,
                                 snn=self.snn, name=f"m{i}"))
            for i in range(self.n)
        ]

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        for _, m in self.inner(c_):
            y1 = m(y1, training)
        y2 = Conv_3(c_, 1, 1, snn=self.snn, name="cv2")(x, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv3")(y, training)


class C3Ghost(C3):
    """C3 with GhostBottleneck inners (reference :2340)."""

    def inner(self, c_):
        return [
            (f"m{i}", GhostBottleneck(c_, snn=self.snn, name=f"m{i}"))
            for i in range(self.n)
        ]


class C3SPP(nn.Module):
    """C3 whose inner stack is a single SPP (reference C3SPP, :2331-2337).

    NOTE: standalone module rather than a C3 subclass because its YAML arg
    order is (c2, k) — the pooling sizes come second, and parse_model does
    NOT insert a repeat count for it (reference yolo_snn.py:861-863 list)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        y1 = SPP(c_, tuple(self.k), snn=self.snn, name="m")(y1, training)
        y2 = Conv_3(c_, 1, 1, snn=self.snn, name="cv2")(x, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv3")(y, training)


class C2f(nn.Module):
    """Fast CSP with 2 convs (reference :2268)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        y = Conv_3(2 * c, 1, 1, snn=self.snn, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                           snn=self.snn, name=f"m{i}")(ys[-1], training)
            )
        return Conv_4(self.c2, 1, snn=self.snn, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (reference :2353)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        pools = [y] + [spatial_max_pool_same(y, k) for k in self.k]
        return Conv_3(self.c2, 1, 1, snn=self.snn, name="cv2")(
            jnp.concatenate(pools, axis=-1), training
        )


class SPPF(nn.Module):
    """Fast SPP (reference :2382): 3 chained k-pools."""

    c2: int
    k: int = 5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        y1 = spatial_max_pool_same(y, self.k)
        y2 = spatial_max_pool_same(y1, self.k)
        y3 = spatial_max_pool_same(y2, self.k)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1), training
        )


class Focus(nn.Module):
    """wh -> channel-space focus (reference :2410)."""

    c2: int
    k: int = 1
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        slices = [
            x[..., ::2, ::2, :],
            x[..., 1::2, ::2, :],
            x[..., ::2, 1::2, :],
            x[..., 1::2, 1::2, :],
        ]
        return Conv(self.c2, self.k, self.s, snn=self.snn, name="conv")(
            jnp.concatenate(slices, axis=-1), training
        )


class GhostConv(nn.Module):
    """Ghost conv (reference :2443): half real + cheap depthwise 5x5."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y = Conv_3(c_, self.k, self.s, g=self.g, snn=self.snn, name="cv1")(
            x, training
        )
        y2 = Conv_4(c_, 5, 1, g=c_, snn=self.snn, name="cv2")(y, training)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference :2462)."""

    c2: int
    k: int = 3
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, snn=self.snn, name="pw")(x, training)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, snn=self.snn, name="dw")(y, training)
        y = GhostConv(self.c2, 1, 1, snn=self.snn, name="pw2")(y, training)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, snn=self.snn, name="sc_dw")(
                x, training
            )
            sc = Conv_3(self.c2, 1, 1, snn=self.snn, name="sc_pw")(sc, training)
        else:
            sc = x if x.shape[-1] == self.c2 else SnnConv(self.c2, 1, name="sc")(x)
        return y + sc


# ---------------------------------------------------------------------------
# slim-neck GSConv family (reference :4228, :1392, :1144)
# ---------------------------------------------------------------------------


class GSConv(nn.Module):
    """Half-channel conv + depthwise 5x5 with channel shuffle
    (reference :4228-4245).  The shuffle de-interleaves even/odd channels."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y1 = Conv_3(c_, self.k, self.s, g=self.g, snn=self.snn, name="cv1")(
            x, training
        )
        y2 = Conv_4(c_, 5, 1, g=c_, snn=self.snn, name="cv2")(y1, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        return jnp.concatenate([y[..., 0::2], y[..., 1::2]], axis=-1)


class BasicBlock_6(nn.Module):
    """GSConv residual block (reference :1392-1431)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 2.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        sc = (
            Shortcut(self.c2, self.s, snn=self.snn, name="shortcut")(x, training)
            if (self.s != 1 or c1 != self.c2)
            else x
        )
        y = GSConv(self.c2, self.k, self.s, snn=self.snn, name="conv1")(x, training)
        y = GSConv(self.c2, self.k, 1, snn=self.snn, name="conv2")(y, training)
        return y + sc


class BasicBlock_1s(nn.Module):
    """GSConv residual with fixed 1024 hidden width (reference :1144-1179)."""

    c2: int
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        sc = (
            Shortcut(self.c2, self.s, snn=self.snn, name="shortcut")(x, training)
            if (self.s != 1 or c1 != self.c2)
            else x
        )
        y = GSConv(1024, 3, self.s, snn=self.snn, name="conv1")(x, training)
        y = GSConv(self.c2, 3, 1, snn=self.snn, name="conv2")(y, training)
        return y + sc


# ---------------------------------------------------------------------------
# StarNet blocks (reference :4277-4887; StarBlock_2 at :4437)
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    """Stochastic depth (reference :4772).  Active only when a 'dropout' rng
    is provided during training."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.rate == 0.0 or not training or not self.has_rng("dropout"):
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return x * mask / keep


class StarBlock_2(nn.Module):
    """StarNet element-wise product block rebuilt with spiking convs
    (reference :4437-4492)."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        inp = x
        y = MemUpdate(act=False, snn=self.snn, name="dw_act")(x, training)
        y = DepthWiseConv(c1, self.k, self.s, (self.k - 1) // 2, name="dw")(
            y, training
        )
        y = TBatchNorm(1.0, self.snn, name="dw_bn")(y, training)
        x1 = Conv_3(self.mlp_ratio * c1, 1, 1, snn=self.snn, name="f1")(y, training)
        x2 = Conv_3(self.mlp_ratio * c1, 1, 1, snn=self.snn, name="f2")(y, training)
        y = jax.nn.relu6(x1) * x2
        y = Conv_4(self.c2, 1, 1, snn=self.snn, name="g")(y, training)
        y2 = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y2 = DepthWiseConv(self.c2, self.k, 1, (self.k - 1) // 2, name="dw2")(
            y2, training
        )
        y2 = TBatchNorm(0.2, self.snn, name="dw2_bn")(y2, training)
        y2 = DropPath(self.drop_path, name="drop")(y2, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(inp, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, use_bias=True, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = inp
        return sc + y2


# ---------------------------------------------------------------------------
# RepVGG / RT-DETR neck (reference models/common2.py:335-439)
# ---------------------------------------------------------------------------


class RepConv(nn.Module):
    """Rep-style 3x3 + 1x1 double branch (reference common2.py:352-439).
    Structural re-parameterization into one conv happens in the fuse pass."""

    c2: int
    k: int = 3
    s: int = 1
    use_id_bn: bool = False
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        id_out = 0.0
        if self.use_id_bn and c1 == self.c2 and self.s == 1:
            id_out = TBatchNorm(1.0, self.snn, name="id_bn")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act")(x, training)
        y1 = SnnConv(self.c2, 3, self.s, 1, name="conv1")(y)
        y1 = TBatchNorm(1.0, self.snn, name="bn1")(y1, training)
        y2 = SnnConv(self.c2, 1, self.s, 0, name="conv2")(y)
        y2 = TBatchNorm(1.0, self.snn, name="bn2")(y2, training)
        return y1 + y2 + id_out


class RepC3(nn.Module):
    """Rep CSP block for the RT-DETR neck (reference common2.py:335-350)."""

    c2: int
    n: int = 3
    e: float = 1.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv_2(self.c2, 1, 1, snn=self.snn, name="cv1")(x, training)
        for i in range(self.n):
            y1 = RepConv(c_, snn=self.snn, name=f"m{i}")(y1, training)
        y2 = Conv_2(self.c2, 1, 1, snn=self.snn, name="cv2")(x, training)
        y = y1 + y2
        if c_ != self.c2:
            y = Conv_2(self.c2, 1, 1, snn=self.snn, name="cv3")(y, training)
        return y


class TokenLIF(nn.Module):
    """Plain-LIF activation for token tensors [T, N, L, C] (see module
    docstring: the reference's ECS-on-tokens path is not meaningful)."""

    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        return lif_scan(x, self.snn, act=False)


def sincos_pos_embed_2d(w: int, h: int, dim: int, temperature: float = 10000.0):
    """2D sine-cosine position embedding (reference common2.py:545-560)."""
    assert dim % 4 == 0
    gw, gh = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32),
        jnp.arange(h, dtype=jnp.float32),
        indexing="ij",
    )
    pos_dim = dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )[None]


class AIFI(nn.Module):
    """RT-DETR intra-scale transformer encoder (reference common2.py:518-543):
    spiking-activated pre/post-norm encoder layer over flattened HW tokens
    with 2D sin-cos position embedding.  The neuron runs over the true T
    axis (the reference flattens t into the batch and scans over t*b —
    a quirk not reproduced here)."""

    cm: int = 2048
    num_heads: int = 8
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        pos = sincos_pos_embed_2d(w, h, c)  # [1, HW, C] (w-major like ref)
        src = x.reshape(t, n, h * w, c)
        act = TokenLIF(self.snn, name="act")

        src = act(src, training)
        pos_s = jnp.broadcast_to(pos[None], (t, n, h * w, c)).astype(src.dtype)
        q = k = src + pos_s
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name="ma"
        )(
            q.reshape(t * n, h * w, c),
            k.reshape(t * n, h * w, c),
            src.reshape(t * n, h * w, c),
        ).reshape(t, n, h * w, c)
        attn = act(attn, training)
        src = src + attn
        src = act(src, training)
        src = nn.LayerNorm(name="norm1")(src)
        src = act(src, training)
        y = nn.Dense(self.cm, name="fc1")(src)
        y = act(y, training)
        y = nn.Dense(c, name="fc2")(y)
        y = act(y, training)
        src = src + y
        src = nn.LayerNorm(name="norm2")(src)
        return src.reshape(t, n, h, w, c)


# ---------------------------------------------------------------------------
# BoTNet (reference :2603-2759)
# ---------------------------------------------------------------------------


class MHSA(nn.Module):
    """Spiking multi-head self-attention (reference :2603-2679): spike-coded
    q/k/v via 1x1 SnnConv+BN, linear attention (k^T v then q @ ..)."""

    c2: int
    num_heads: int = 8
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, b, h, w, c = x.shape
        nh = self.num_heads
        d = self.c2 // nh
        m = MemUpdate(act=False, snn=self.snn, name="m")
        x = m(x, training)

        def qkv(name):
            y = SnnConv(self.c2, 1, name=f"{name}_conv")(x)
            y = TBatchNorm(1.0, self.snn, name=f"{name}_bn")(y, training)
            y = MemUpdate(act=False, snn=self.snn, name=f"{name}_act")(y, training)
            return y.reshape(t, b, h * w, nh, d).transpose(0, 1, 3, 2, 4)

        q, k, v = qkv("q"), qkv("k"), qkv("v")
        kv = jnp.einsum("tbhnd,tbhne->tbhde", k, v)
        out = jnp.einsum("tbhnd,tbhde->tbhne", q, kv) * 0.125
        out = out.transpose(0, 1, 3, 2, 4).reshape(t, b, h, w, self.c2)
        # token-level LIF on the attention output (reference reshapes to
        # [T,B,C,N] and runs mem_update; ECS-on-attention is not meaningful)
        out = TokenLIF(self.snn, name="attn_act")(
            out.reshape(t, b, h * w, self.c2), training
        ).reshape(t, b, h, w, self.c2)
        out = SnnConv(self.c2, 1, use_bias=True, name="proj_conv")(out)
        return TBatchNorm(1.0, self.snn, name="proj_bn")(out, training)


class BottleneckTransformer(nn.Module):
    """MHSA bottleneck (reference :2682-2726)."""

    c2: int
    s: int = 1
    heads: int = 4
    expansion: float = 1.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.expansion)
        y = MemUpdate(act=False, snn=self.snn, name="cv1_act")(x, training)
        y = SnnConv(c_, 1, 1, name="cv1_conv")(y)
        y = TBatchNorm(1.0, self.snn, name="cv1_bn")(y, training)
        y = MHSA(self.c2, self.heads, snn=self.snn, name="mhsa")(y, training)
        if self.s == 2:
            y, t_ = fold_t(y)
            y = nn.avg_pool(y, (2, 2), (2, 2))
            y = unfold_t(y, t_)
        return x + y if c1 == self.c2 and self.s == 1 else y


class BoT3(nn.Module):
    """CSP block with transformer inners (reference :2728-2759)."""

    c2: int
    n: int = 1
    e: float = 0.5
    e2: float = 1.0
    w: int = 20
    h: int = 20
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)

        def branch(name, cin_x):
            y = MemUpdate(act=False, snn=self.snn, name=f"{name}_act")(cin_x, training)
            y = SnnConv(c_, 1, 1, name=f"{name}_conv")(y)
            return TBatchNorm(1.0, self.snn, name=f"{name}_bn")(y, training)

        y1 = branch("cv1", x)
        for i in range(self.n):
            y1 = BottleneckTransformer(
                c_, 1, 4, self.e2, snn=self.snn, name=f"m{i}"
            )(y1, training)
        y2 = branch("cv2", x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = MemUpdate(act=False, snn=self.snn, name="cv3_act")(y, training)
        y = SnnConv(self.c2, 1, 1, name="cv3_conv")(y)
        return TBatchNorm(1.0, self.snn, name="cv3_bn")(y, training)


# ---------------------------------------------------------------------------
# EMA multi-scale attention (reference :3124-3156)
# ---------------------------------------------------------------------------


class EMAAttention(nn.Module):
    """Efficient multi-scale attention, grouped channels
    (reference ``EMA``, :3124-3156).  Registry name 'EMA'."""

    factor: int = 8
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        gx = x.reshape(t, b * g, h, w, cg)
        x_h = gx.mean(axis=3, keepdims=True)  # pool over W -> [t,bg,h,1,cg]
        x_w = gx.mean(axis=2, keepdims=True)  # pool over H -> [t,bg,1,w,cg]
        x_w_t = x_w.transpose(0, 1, 3, 2, 4)  # [t,bg,w,1,cg]
        hw = jnp.concatenate([x_h, x_w_t], axis=2)  # [t,bg,h+w,1,cg]
        hw = SnnConv(cg, 1, name="conv1x1")(hw)
        x_h2, x_w2 = hw[:, :, :h], hw[:, :, h:]
        x_w2 = x_w2.transpose(0, 1, 3, 2, 4)
        x1 = gx * jax.nn.sigmoid(x_h2) * jax.nn.sigmoid(x_w2)
        # per-(sample,channel) groupnorm over spatial (GN(cg, cg) == IN)
        mean = x1.mean(axis=(2, 3), keepdims=True)
        var = x1.var(axis=(2, 3), keepdims=True)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (cg,))
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (cg,))
        x1 = (x1 - mean) / jnp.sqrt(var + 1e-5) * gn_scale + gn_bias
        x2 = SnnConv(cg, 3, 1, 1, name="conv3x3")(gx)
        x11 = jax.nn.softmax(x1.mean(axis=(2, 3)), axis=-1)  # [t,bg,cg]
        x12 = x2.reshape(t, b * g, h * w, cg)
        x21 = jax.nn.softmax(x2.mean(axis=(2, 3)), axis=-1)
        x22 = x1.reshape(t, b * g, h * w, cg)
        weights = (
            jnp.einsum("tgc,tgnc->tgn", x11, x12)
            + jnp.einsum("tgc,tgnc->tgn", x21, x22)
        ).reshape(t, b * g, h, w, 1)
        out = gx * jax.nn.sigmoid(weights)
        return out.reshape(t, b, h, w, c)


# ---------------------------------------------------------------------------
# ASFF adaptive fusion (reference :4958-5100)
# ---------------------------------------------------------------------------


class ASFF2(nn.Module):
    """Adaptive fusion of 2 pyramid levels (reference ASFF2, :5051-5100).
    Input: [small(P5-like), large(P4-like)] feature list; `level` selects the
    output resolution."""

    level: int = 0
    rfb: bool = False
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x0, x1 = xs  # x0: deeper/smaller, x1: shallower/larger
        inter = (x0 if self.level == 0 else x1).shape[-1]
        if self.level == 0:
            r0 = x0
            r1 = Conv_3(inter, 3, 2, snn=self.snn, name="stride1")(x1, training)
        else:
            r0 = Conv_3(inter, 1, 1, snn=self.snn, name="compress0")(x0, training)
            r0 = interpolate_nearest(r0, 2)
            r1 = x1
        cc = 8 if self.rfb else 16
        w0 = GSConv(cc, 1, 1, snn=self.snn, name="w0")(r0, training)
        w1 = GSConv(cc, 1, 1, snn=self.snn, name="w1")(r1, training)
        wts = SnnConv(2, 1, use_bias=True, name="wl")(
            jnp.concatenate([w0, w1], axis=-1)
        )
        wts = jax.nn.softmax(wts, axis=-1)
        fused = r0 * wts[..., 0:1] + r1 * wts[..., 1:2]
        c_out = x0.shape[-1] if self.level == 0 else x1.shape[-1]
        return Conv_4(c_out, 3, 1, snn=self.snn, name="expand")(fused, training)


class ASFF3(nn.Module):
    """Adaptive fusion of 3 pyramid levels (reference ASFF3, :4958-5030)."""

    level: int = 0
    rfb: bool = False
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x0, x1, x2 = xs  # deep->shallow
        inter = xs[self.level].shape[-1]
        if self.level == 0:
            r0 = x0
            r1 = Conv_5(inter, 3, 2, snn=self.snn, name="s1")(x1, training)
            r2 = max_pool_t(x2, 2)
            r2 = Conv_5(inter, 3, 2, snn=self.snn, name="s2")(r2, training)
        elif self.level == 1:
            r0 = Conv_5(inter, 1, 1, snn=self.snn, name="c0")(x0, training)
            r0 = interpolate_nearest(r0, 2)
            r1 = x1
            r2 = Conv_5(inter, 3, 2, snn=self.snn, name="s2")(x2, training)
        else:
            r0 = Conv_5(inter, 1, 1, snn=self.snn, name="c0")(x0, training)
            r0 = interpolate_nearest(r0, 4)
            r1 = Conv_5(inter, 1, 1, snn=self.snn, name="c1")(x1, training)
            r1 = interpolate_nearest(r1, 2)
            r2 = x2
        cc = 8 if self.rfb else 16
        w0 = Conv_5(cc, 1, 1, snn=self.snn, name="w0")(r0, training)
        w1 = Conv_5(cc, 1, 1, snn=self.snn, name="w1")(r1, training)
        w2 = Conv_5(cc, 1, 1, snn=self.snn, name="w2")(r2, training)
        wts = SnnConv(3, 1, use_bias=True, name="wl")(
            jnp.concatenate([w0, w1, w2], axis=-1)
        )
        wts = jax.nn.softmax(wts, axis=-1)
        fused = r0 * wts[..., 0:1] + r1 * wts[..., 1:2] + r2 * wts[..., 2:3]
        return Conv_6(xs[self.level].shape[-1], 3, 1, snn=self.snn, name="expand")(
            fused, training
        )


# ---------------------------------------------------------------------------
# DSSA spike-driven self-attention (reference :3329-3406)
# ---------------------------------------------------------------------------


class DSSA(nn.Module):
    """Dual spike-driven self-attention with firing-rate-calibrated scaling
    (reference :3339-3406).  The firing-rate EMA buffers live in the
    ``batch_stats`` collection (mutable in training, frozen at eval)."""

    num_heads: int = 8
    momentum: float = 0.999
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, b, h, w, c = x.shape
        nh = self.num_heads
        d = c // nh
        n = h * w
        x_feat = x

        x = MemUpdate(act=False, snn=self.snn, name="act_in")(x, training)
        y = SnnConv(2 * c, 3, 1, 1, name="W")(x)
        y = TBatchNorm(1.0, self.snn, name="norm")(y, training)
        y = y.reshape(t, b, n, nh, 2 * d)
        y1, y2 = y[..., :d], y[..., d:]
        xt = x.reshape(t, b, n, nh, d)

        fr_x = self.variable(
            "batch_stats", "firing_rate_x", lambda: jnp.full((nh,), 0.01)
        )
        fr_attn = self.variable(
            "batch_stats", "firing_rate_attn", lambda: jnp.full((nh,), 0.01)
        )
        if training and not self.is_initializing():
            cur = jax.lax.stop_gradient(xt.mean(axis=(0, 1, 2, 4)))
            fr_x.value = fr_x.value * self.momentum + cur * (1 - self.momentum)
        scale1 = jax.lax.rsqrt(
            jnp.maximum(fr_x.value * d, 1e-6)
        ).reshape(1, 1, 1, nh, 1)

        # attn[t,b,m,h_, n] over token pairs
        attn = jnp.einsum("tbnhd,tbmhd->tbnhm", y1, xt) * scale1[..., None, :, :, 0:1]
        attn = attn.reshape(t, b, n, nh, n)
        attn = TokenLIF(self.snn, name="act_attn")(
            attn.reshape(t, b, n * nh, n), training
        ).reshape(t, b, n, nh, n)
        if training and not self.is_initializing():
            cur = jax.lax.stop_gradient(attn.mean(axis=(0, 1, 2, 4)))
            fr_attn.value = fr_attn.value * self.momentum + cur * (1 - self.momentum)
        scale2 = jax.lax.rsqrt(jnp.maximum(fr_attn.value, 1e-6)).reshape(
            1, 1, 1, nh, 1
        )
        out = jnp.einsum("tbnhm,tbmhd->tbnhd", attn, y2) * scale2
        out = out.reshape(t, b, h, w, c)
        out = MemUpdate(act=False, snn=self.snn, name="act_out")(out, training)
        out = SnnConv(c, 1, use_bias=True, name="Wproj")(out)
        out = TBatchNorm(1.0, self.snn, name="norm_proj")(out, training)
        return out + x_feat


# ---------------------------------------------------------------------------
# misc plumbing blocks
# ---------------------------------------------------------------------------


class Contract(nn.Module):
    """Space-to-depth (reference :1726): [.., h, w, c] -> [.., h/g, w/g, c*g^2]."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, training: bool = False):
        g = self.gain
        t, n, h, w, c = x.shape
        x = x.reshape(t, n, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(t, n, h // g, w // g, c * g * g)


class Expand(nn.Module):
    """Depth-to-space (reference :1742)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, training: bool = False):
        g = self.gain
        t, n, h, w, c = x.shape
        x = x.reshape(t, n, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(t, n, h * g, w * g, c // (g * g))


class Silence(nn.Module):
    """Identity (reference :3678, used by YOLOv9 graphs)."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        return x


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference :3984)."""

    reduction: int = 16
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        s = x.mean(axis=(2, 3))  # [t, n, c]
        s = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, use_bias=False, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, :, None, None, :]


class CBLinear(nn.Module):
    """1x1 conv split into a list of channel groups (reference :327)."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = SnnConv(sum(self.c2s), self.k, self.s, use_bias=True, name="conv")(x)
        return list(jnp.split(y, np_cumsum(self.c2s)[:-1], axis=-1))


def np_cumsum(t):
    out, s = [], 0
    for v in t:
        s += v
        out.append(s)
    return out


class CBFuse(nn.Module):
    """Fuse CBLinear outputs by nearest-upsampling + sum (reference :340)."""

    idx: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, xs, training: bool = False):
        target = xs[-1]
        th, tw = target.shape[2], target.shape[3]
        outs = []
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]] if isinstance(x, (list, tuple)) else x
            if sel.shape[2] != th or sel.shape[3] != tw:
                sel = jax.image.resize(
                    sel, sel.shape[:2] + (th, tw) + sel.shape[4:], "nearest"
                )
            outs.append(sel)
        return sum(outs) + target
