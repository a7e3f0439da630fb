"""Long-tail experimental blocks (reference models/common.py appendix).

Covers the remaining parse_model-reachable classes: the Bottleneck_1-4 and
BasicBlock_3-5 residual variants, Concat_res3-6, BasicBlock_ms /
ConcatBlock_ms, PartialConv / FasterNetBlock, ELA, ScConv (SRU+CRU), CoT,
DualConv, HGBlock, MobileNetV3, ContextGuideFusionModule, TransformerBlock /
C3TR.  File:line cites refer to reference models/common.py.

Concat_res5 uses the real gather-based deformable AKConv from blocks_tail2
(round-5; the earlier standard-conv substitution is gone — the offsets'
bilinear gathers are static-shape `take_along_axis` ops XLA tiles fine,
they are just not MXU-dense).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from .blocks import (
    SnnConv,
    TBatchNorm,
    MemUpdate,
    Conv_3,
    Conv_4,
    fold_t,
    unfold_t,
    max_pool_t,
)


class _Seq(nn.Module):
    """mem/conv/bn stack helper: ops is a tuple of (kind, kwargs) rows."""

    ops: Tuple
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i, (kind, kw) in enumerate(self.ops):
            name = f"{i}"
            if kind == "mem":
                x = MemUpdate(act=False, snn=self.snn, name=name)(x, training)
            elif kind == "conv":
                x = SnnConv(name=name, **kw)(x)
            elif kind == "bn":
                x = TBatchNorm(kw.get("g", 1.0), self.snn, name=name)(x, training)
            elif kind == "pool":
                x = max_pool_t(x, kw["s"])
        return x


def _mcb(c2, k=3, s=1, g=1, bn_scale=1.0):
    pad = 1 if k == 3 else 0
    return (
        ("mem", {}),
        ("conv", dict(c2=c2, k=k, s=s, p=pad, g=g)),
        ("bn", {"g": bn_scale}),
    )


class Bottleneck_1(nn.Module):
    """1x1 -> depthwise 3x3 -> 1x1 with 1024 hidden (reference :902-932)."""

    c2: int
    s: int = 1
    e: float = 4.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = 1024
        ops = (
            *_mcb(c_, 1, 1, bn_scale=0.2),
            *_mcb(c_, 3, self.s, g=c_, bn_scale=1.0),
            *_mcb(self.c2, 1, 1, bn_scale=0.2),
        )
        y = _Seq(ops, self.snn, name="res")(x, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = _Seq(_mcb(self.c2, 1, 1), self.snn, name="sc")(sc, training)
        else:
            sc = x
        return y + sc


class Bottleneck_2(nn.Module):
    """1x1 -> kxk -> 1x1 expanding to width=e*c2 (reference :934-970)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 4.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        width = int(self.c2 * self.e)
        ops = (
            *_mcb(self.c2, 1, 1, bn_scale=0.2),
            *_mcb(self.c2, self.k, self.s, bn_scale=1.0),
            *_mcb(width, 1, 1, bn_scale=0.2),
        )
        y = _Seq(ops, self.snn, name="res")(x, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = _Seq(_mcb(width, 1, 1), self.snn, name="sc")(sc, training)
        else:
            sc = x
        return y + sc


class Bottleneck_3(nn.Module):
    """Inverted bottleneck, depthwise mid conv (reference :972-1008)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 6.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        width = int(c1 * self.e)
        ops = (
            *_mcb(width, 1, 1, bn_scale=0.2),
            *_mcb(width, self.k, self.s, g=width, bn_scale=1.0),
            *_mcb(self.c2, 1, 1, bn_scale=0.2),
        )
        y = _Seq(ops, self.snn, name="res")(x, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = _Seq(_mcb(self.c2, 1, 1), self.snn, name="sc")(sc, training)
        else:
            sc = x
        return y + sc


class Bottleneck_4(nn.Module):
    """Inverted bottleneck with channel-expanding concat shortcut
    (reference :1010-1047)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 6.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        width = int(c1 * self.e)
        ops = (
            *_mcb(width, 1, 1, bn_scale=0.2),
            *_mcb(width, self.k, self.s, g=width, bn_scale=1.0),
            *_mcb(self.c2, 1, 1, bn_scale=0.2),
        )
        y = _Seq(ops, self.snn, name="res")(x, training)
        if c1 < self.c2:
            t = _Seq(_mcb(self.c2 - c1, 1, 1), self.snn, name="sc")(x, training)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        return y + max_pool_t(sc, self.s)


class BasicBlock_3(nn.Module):
    """Pre-norm residual: bn -> mem -> conv -> bn1 -> mem -> conv
    (reference :1222-1265)."""

    c2: int
    k: int = 3
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = TBatchNorm(1.0, self.snn, name="bn0")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act1")(y, training)
        y = SnnConv(self.c2, self.k, self.s, pad, name="conv1")(y)
        y = TBatchNorm(0.2, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="conv2")(y)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
        else:
            sc = x
        return y + sc


class BasicBlock_4(nn.Module):
    """RepConv front + spiking conv residual (reference :1267-1298)."""

    c2: int
    k: int = 3
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks_ext import RepConv

        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = RepConv(self.c2, self.k, self.s, snn=self.snn, name="rep")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="conv")(y)
        y = TBatchNorm(0.2, self.snn, name="bn")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = _Seq(_mcb(self.c2, 1, 1), self.snn, name="sc")(sc, training)
        else:
            sc = x
        return y + sc


class PartialConv(nn.Module):
    """Conv on the first 1/n_div channels only (reference :3807-3853)."""

    n_div: int = 4
    k: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        cp = c // self.n_div
        x1, x2 = x[..., :cp], x[..., cp:]
        x1 = SnnConv(
            cp, self.k, 1, self.dilation, dilation=self.dilation, name="pconv"
        )(x1)
        return jnp.concatenate([x1, x2], axis=-1)


class FasterNetBlock(nn.Module):
    """PartialConv + expand/project MLP residual (reference :3855-3873)."""

    expand_ratio: int = 2
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        y = PartialConv(name="pconv")(x, training)
        y = SnnConv(c * self.expand_ratio, 1, use_bias=True, name="conv1")(y)
        y = TBatchNorm(0.2, self.snn, name="bn")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act")(y, training)
        y = SnnConv(c, 1, use_bias=True, name="conv2")(y)
        return y + x


class BasicBlock_5(nn.Module):
    """Residual with PartialConv tail (reference :1300-1348)."""

    c2: int
    k: int = 3
    s: int = 1
    dilation: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = MemUpdate(act=False, snn=self.snn, name="act1")(x, training)
        y = SnnConv(self.c2, self.k, self.s, pad, name="conv1")(y)
        y = TBatchNorm(1.0, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = PartialConv(dilation=self.dilation, name="pconv")(y, training)
        y = TBatchNorm(0.2, self.snn, name="bn2")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = _Seq(_mcb(self.c2, 1, 1), self.snn, name="sc")(sc, training)
        else:
            sc = x
        return y + sc


class BasicBlock_ms(nn.Module):
    """Half-width hidden residual (reference :1658-1688)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        pad = 1 if self.k == 3 else 0
        y = _Seq(
            (*_mcb(c_, self.k, self.s), *_mcb(self.c2, self.k, 1, bn_scale=0.2)),
            self.snn, name="res",
        )(x, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = x
        return y + sc


class ConcatBlock_ms(nn.Module):
    """BasicBlock_ms with concat shortcut (reference :1690-1724)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = _Seq(
            (*_mcb(c_, self.k, self.s), *_mcb(self.c2, self.k, 1, bn_scale=0.2)),
            self.snn, name="res",
        )(x, training)
        if c1 < self.c2:
            t = _Seq(_mcb(self.c2 - c1, 1, 1), self.snn, name="sc")(x, training)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        return y + max_pool_t(sc, self.s)


class SELayerInner(nn.Module):
    """SE gate returning the excitation (used inside Concat_res3)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(2, 3))
        s = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, use_bias=False, name="fc2")(s)
        return jax.nn.sigmoid(s)[:, :, None, None, :]


class Concat_res3(nn.Module):
    """Concat_res2 + SE-modulated residual (reference :1491-1533)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        y = _Seq(
            (*_mcb(self.c2, self.k, self.s), *_mcb(self.c2, self.k, 1, bn_scale=0.2)),
            self.snn, name="res",
        )(x, training)
        if c1 < self.c2:
            t = _Seq(_mcb(self.c2 - c1, 1, 1), self.snn, name="sc")(x, training)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        sc = max_pool_t(sc, self.s)
        se = SELayerInner(name="se")(y)
        return y * se + sc


class Concat_res4(nn.Module):
    """Pre-norm variant of Concat_res2 (reference :1535-1578)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = TBatchNorm(1.0, self.snn, name="bn0")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act1")(y, training)
        y = SnnConv(self.c2, self.k, self.s, pad, name="conv1")(y)
        y = TBatchNorm(0.2, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="conv2")(y)
        if c1 < self.c2:
            t = TBatchNorm(1.0, self.snn, name="sc_bn")(x, training)
            t = MemUpdate(act=False, snn=self.snn, name="sc_act")(t, training)
            t = SnnConv(self.c2 - c1, 1, 1, name="sc_conv")(t)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        return y + max_pool_t(sc, self.s)


class Concat_res5(nn.Module):
    """Concat_res2 variant whose residual tail is a real deformable AKConv
    (reference :1580-1615 — ``mem_update → Snn_Conv2d → BN → mem_update →
    AKConv(num_param=k_size, stride=1)``, no BN after the AKConv).  Uses
    the gather-based bilinear AKConv from blocks_tail2 (round-5: previously
    substituted with a standard conv; the substitution and its docstrings
    are gone)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks_tail2 import AKConv

        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = MemUpdate(act=False, snn=self.snn, name="act1")(x, training)
        y = SnnConv(self.c2, self.k, self.s, pad, name="conv1")(y)
        y = TBatchNorm(1.0, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = AKConv(self.c2, num_param=self.k, s=1, snn=self.snn,
                   name="conv2")(y, training)
        if c1 < self.c2:
            t = _Seq(_mcb(self.c2 - c1, 1, 1), self.snn, name="sc")(x, training)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        return y + max_pool_t(sc, self.s)


class ScConv(nn.Module):
    """SRU spatial gating + CRU channel reconstruction (reference :3875-3982)."""

    group_num: int = 16
    gate_threshold: float = 0.5
    alpha: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        g = min(self.group_num, c)
        # SRU: group-norm gating
        gamma = self.param("gn_gamma", nn.initializers.normal(1.0), (c,))
        beta = self.param("gn_beta", nn.initializers.zeros, (c,))
        xg = x.reshape(t, n, h * w * c // g, g) if False else x
        xr = x.reshape(t, n, g, -1)
        mean = xr.mean(-1, keepdims=True)
        std = xr.std(-1, keepdims=True)
        gn = ((xr - mean) / (std + 1e-10)).reshape(t, n, h, w, c)
        gn = gn * gamma + beta
        w_gamma = gamma / jnp.sum(gamma)
        rw = jax.nn.sigmoid(gn * w_gamma)
        info = (rw >= self.gate_threshold).astype(x.dtype) * x
        noninfo = (rw < self.gate_threshold).astype(x.dtype) * x
        h1, h2 = jnp.split(info, 2, axis=-1)
        l1, l2 = jnp.split(noninfo, 2, axis=-1)
        y = jnp.concatenate([h1 + l2, h2 + l1], axis=-1)

        # CRU
        up_c = int(self.alpha * c)
        low_c = c - up_c
        up, low = y[..., :up_c], y[..., up_c:]
        up = SnnConv(up_c // self.squeeze_radio, 1, name="squeeze1")(up)
        low = SnnConv(low_c // self.squeeze_radio, 1, name="squeeze2")(low)
        y1 = SnnConv(c, 3, 1, 1, g=self.group_size, use_bias=True, name="gwc")(up) + \
            SnnConv(c, 1, name="pwc1")(up)
        y2 = jnp.concatenate(
            [SnnConv(c - low_c // self.squeeze_radio, 1, name="pwc2")(low), low],
            axis=-1,
        )
        out = jnp.concatenate([y1, y2], axis=-1)
        att = jax.nn.softmax(out.mean(axis=(2, 3), keepdims=True), axis=-1)
        out = att * out
        o1, o2 = jnp.split(out, 2, axis=-1)
        return o1 + o2


class Concat_res6(nn.Module):
    """PartialConv + ScConv residual with concat shortcut (reference :1617)."""

    c2: int
    k: int = 3
    s: int = 1
    e: float = 2.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        y = MemUpdate(act=False, snn=self.snn, name="act1")(x, training)
        y = PartialConv(name="pconv")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = SnnConv(self.c2, self.k, self.s, pad, name="conv")(y)
        y = TBatchNorm(1.0, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act3")(y, training)
        y = ScConv(snn=self.snn, name="scconv")(y, training)
        y = TBatchNorm(0.2, self.snn, name="bn2")(y, training)
        if c1 < self.c2:
            t = _Seq(_mcb(self.c2 - c1, 1, 1), self.snn, name="sc")(x, training)
            sc = jnp.concatenate([t, x], axis=-1)
        else:
            sc = x
        return y + max_pool_t(sc, self.s)


class ELA(nn.Module):
    """Efficient local attention: 1-D depthwise convs over pooled H and W
    profiles (reference :3751-3773)."""

    k: int = 7
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        conv = nn.Conv(
            c, (self.k,), padding=[(self.k // 2, self.k // 2)],
            feature_group_count=c, use_bias=False, name="conv1d",
        )
        gn_scale = self.param("gn_scale", nn.initializers.ones, (c,))
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (c,))

        def attend(profile):  # [t*n, L, c]
            y = conv(profile)
            groups = min(16, c)
            yr = y.reshape(y.shape[0], y.shape[1] * (c // groups), groups) \
                if False else y
            # GroupNorm(16, c) over (L, group channels)
            yg = y.reshape(y.shape[0], -1, groups, c // groups)
            mean = yg.mean(axis=(1, 3), keepdims=True)
            var = yg.var(axis=(1, 3), keepdims=True)
            yg = (yg - mean) / jnp.sqrt(var + 1e-5)
            y = yg.reshape(y.shape) * gn_scale + gn_bias
            return jax.nn.sigmoid(y)

        x_h = attend(x.mean(axis=3).reshape(t * n, h, c)).reshape(t, n, h, 1, c)
        x_w = attend(x.mean(axis=2).reshape(t * n, w, c)).reshape(t, n, 1, w, c)
        return x * x_h * x_w


class CoT(nn.Module):
    """Contextual transformer block (reference :3049-3090)."""

    k: int = 3
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        x = MemUpdate(act=False, snn=self.snn, name="head")(x, training)
        k1 = SnnConv(c, self.k, 1, self.k // 2, g=4, name="key_conv")(x)
        k1 = TBatchNorm(1.0, self.snn, name="key_bn")(k1, training)
        v = SnnConv(c, 1, name="val_conv")(x)
        v = TBatchNorm(1.0, self.snn, name="val_bn")(v, training)
        y = jnp.concatenate([k1, x], axis=-1)
        factor = 4
        a = MemUpdate(act=False, snn=self.snn, name="att_act1")(y, training)
        a = SnnConv(2 * c // factor, 1, name="att_conv1")(a)
        a = TBatchNorm(1.0, self.snn, name="att_bn")(a, training)
        a = MemUpdate(act=False, snn=self.snn, name="att_act2")(a, training)
        a = SnnConv(self.k * self.k * c, 1, use_bias=True, name="att_conv2")(a)
        a = a.reshape(t, n, h, w, c, self.k * self.k).mean(-1)
        k2 = a * v
        return k1 + k2


class DualConv(nn.Module):
    """Grouped 3x3 + pointwise sum (reference :4200-4226)."""

    c2: int
    s: int = 1
    g: int = 4
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y1 = SnnConv(self.c2, 3, self.s, 1, g=self.g, name="gc")(x)
        y2 = SnnConv(self.c2, 1, self.s, name="pwc")(x)
        return y1 + y2


class HGBlock(nn.Module):
    """HGNetV2 block (reference :4247-4275): optional DWConv stride-2 entry,
    n LightConv/Conv_3 stages, squeeze (Conv_3) + excitation (Conv_4) 1x1
    fusion, optional residual."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    s: int = 1
    lightconv: bool = False
    shortcut: bool = False
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks_ext import LightConv, DWConv

        if self.s == 2:
            x = DWConv(x.shape[-1], self.k, 2, snn=self.snn, name="dw")(
                x, training
            )
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                stage = LightConv(self.cm, self.k, snn=self.snn, name=f"m{i}")
            else:
                stage = Conv_3(self.cm, self.k, 1, snn=self.snn, name=f"m{i}")
            ys.append(stage(ys[-1], training))
        y = jnp.concatenate(ys, axis=-1)
        y = Conv_3(self.c2 // 2, 1, 1, snn=self.snn, name="sc")(y, training)
        y = Conv_4(self.c2, 1, 1, snn=self.snn, name="ec")(y, training)
        return y + x if self.shortcut and x.shape[-1] == self.c2 else y


class MobileNetV3(nn.Module):
    """MobileNetV3 inverted residual with SE (reference :4005-4053)."""

    c2: int
    hidden: int = 0
    k: int = 3
    s: int = 1
    use_se: bool = True
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks_ext import SELayer

        c1 = x.shape[-1]
        hid = self.hidden or c1 * 4
        y = _Seq(_mcb(hid, 1, 1), self.snn, name="expand")(x, training)
        y = _Seq(
            _mcb(hid, self.k, self.s, g=hid), self.snn, name="dw"
        )(y, training)
        if self.use_se:
            y = SELayer(reduction=4, snn=self.snn, name="se")(y, training)
        y = _Seq(_mcb(self.c2, 1, 1, bn_scale=0.2), self.snn, name="project")(
            y, training
        )
        if self.s == 1 and c1 == self.c2:
            y = y + x
        return y


class ContextGuideFusionModule(nn.Module):
    """Cross-gated two-input fusion (reference :1768-1790)."""

    dim: Any = None  # positional YAML-compat slot (concat-dim arg, unused)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x0, x1 = xs
        if x0.shape[-1] != x1.shape[-1]:
            x0 = SnnConv(x1.shape[-1], 1, use_bias=True, name="adjust")(x0)
        cat = jnp.concatenate([x0, x1], axis=-1)
        se = ELA(snn=self.snn, name="se")(cat, training)
        w0, w1 = jnp.split(se, 2, axis=-1)
        return jnp.concatenate([x0 + x1 * w1, x1 + x0 * w0], axis=-1)


class ContextGuideFusionModulev2(nn.Module):
    """v2 of the cross-gated fusion (reference ContextGuideFusionModulev2,
    :1791-1819): EMA attention replaces ELA for the gate, plus a shared-conv
    multiplicative interaction term ``ans = conv(w0) * conv(w1)`` added to
    both halves of the output concat."""

    dim: Any = None  # positional YAML-compat slot (concat-dim arg, unused)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs, training: bool = False):
        from .blocks_ext import EMAAttention

        x0, x1 = xs
        c = x1.shape[-1]
        if x0.shape[-1] != c:
            x0 = SnnConv(c, 1, use_bias=True, name="adjust")(x0)
        cat = jnp.concatenate([x0, x1], axis=-1)
        se = EMAAttention(snn=self.snn, name="se")(cat, training)
        w0, w1 = jnp.split(se, 2, axis=-1)
        conv = SnnConv(c, 3, 1, 1, use_bias=True, name="convs")
        ans = conv(w0) * conv(w1)
        return jnp.concatenate(
            [x0 + x1 * w1 + ans, x1 + x0 * w0 + ans], axis=-1
        )


class TransformerBlock(nn.Module):
    """ViT-style block stack on flattened tokens (reference :2505-2552),
    spiking activations over the true T axis."""

    c2: int
    num_heads: int = 4
    n: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks_ext import TokenLIF

        t, n, h, w, c = x.shape
        if c != self.c2:
            x = SnnConv(self.c2, 1, name="conv")(x)
            c = self.c2
        tokens = x.reshape(t, n, h * w, c)
        pos = self.param(
            "pos", nn.initializers.normal(0.02), (1, 1, h * w, c)
        )
        tokens = tokens + pos
        for i in range(self.n):
            a = TokenLIF(self.snn, name=f"lif{i}")(tokens, training)
            att = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"ma{i}"
            )(
                a.reshape(t * n, h * w, c),
                a.reshape(t * n, h * w, c),
            ).reshape(t, n, h * w, c)
            tokens = tokens + att
            f = nn.Dense(c, name=f"fc1_{i}")(tokens)
            f = jax.nn.silu(f)
            f = nn.Dense(c, name=f"fc2_{i}")(f)
            tokens = tokens + f
        return tokens.reshape(t, n, h, w, c)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner (reference :2482-2504)."""

    c2: int
    n: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks import Conv_4

        c_ = int(self.c2 * self.e)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        y1 = TransformerBlock(c_, 4, self.n, snn=self.snn, name="m")(y1, training)
        y2 = Conv_3(c_, 1, 1, snn=self.snn, name="cv2")(x, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv3")(y, training)
