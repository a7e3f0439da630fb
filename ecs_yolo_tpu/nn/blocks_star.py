"""Remaining StarNet block variants (reference models/common.py:4277-4887).

StarBlock_2 (the one shipped starnet.yaml uses) lives in blocks_ext; these
complete the family: the plain StarBlock, the 1024-hidden StarBlock_1, and
StarBlock_3 (concat shortcut).  ``MStarBlock`` wraps StarBlock_2 with an
extra residual per the reference (:4788).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from .blocks import (
    SnnConv, TBatchNorm, MemUpdate, Conv_1, Conv_3, Conv_4,
    DepthWiseConv, max_pool_t,
)
from .blocks_ext import DropPath, StarBlock_2


class StarBlock(nn.Module):
    """Plain StarNet block (reference :4277-4298): Conv_3 entry, 7x7
    depthwise, relu6(f1)*f2 gate, residual."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv_3(self.c2, self.k, self.s, snn=self.snn, name="dw")(x, training)
        inp = y
        y = Conv_1(self.c2, 7, 1, 3, g=self.c2, snn=self.snn, name="dwconv")(
            y, training
        )
        x1 = Conv_1(self.mlp_ratio * self.c2, 1, 1, snn=self.snn, name="f1")(
            y, training
        )
        x2 = Conv_1(self.mlp_ratio * self.c2, 1, 1, snn=self.snn, name="f2")(
            y, training
        )
        y = jax.nn.relu6(x1) * x2
        y = Conv_1(self.c2, 1, 1, snn=self.snn, name="g")(y, training)
        y = Conv_1(self.c2, 7, 1, 3, g=self.c2, snn=self.snn, name="dwconv2")(
            y, training
        )
        y = DropPath(self.drop_path, name="drop")(y, training)
        return inp + y


class StarBlock_1s(nn.Module):
    """1x1-expand-first gated block (reference StarBlock_1s, :4375-4436):
    dw = spike -> 1x1 (c1 -> r*c2) -> BN; two parallel depthwise kxk/s
    branches f1 (BN gamma=thresh) and f2 (BN gamma=0.2*thresh) gated
    ``relu6(f1) * f2``; dw2 = spike -> 1x1 (r*c2 -> c2, bias) -> depthwise
    kxk -> BN; out = shortcut(input) + drop_path(gate path)."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    add: bool = True  # positional YAML-compat slot (reference, unused)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        ch = self.mlp_ratio * self.c2
        pad = (self.k - 1) // 2
        y = MemUpdate(act=False, snn=self.snn, name="dw_act")(x, training)
        y = SnnConv(ch, 1, 1, name="dw_conv")(y)
        y = TBatchNorm(1.0, self.snn, name="dw_bn")(y, training)
        x1 = MemUpdate(act=False, snn=self.snn, name="f1_act")(y, training)
        x1 = SnnConv(ch, self.k, self.s, pad, g=ch, name="f1_conv")(x1)
        x1 = TBatchNorm(1.0, self.snn, name="f1_bn")(x1, training)
        x2 = MemUpdate(act=False, snn=self.snn, name="f2_act")(y, training)
        x2 = SnnConv(ch, self.k, self.s, pad, g=ch, name="f2_conv")(x2)
        x2 = TBatchNorm(0.2, self.snn, name="f2_bn")(x2, training)
        y = jax.nn.relu6(x1) * x2
        y = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y = SnnConv(self.c2, 1, 1, use_bias=True, name="dw2_conv1")(y)
        y = SnnConv(self.c2, self.k, 1, pad, g=self.c2, name="dw2_conv2")(y)
        y = TBatchNorm(1.0, self.snn, name="dw2_bn")(y, training)
        y = DropPath(self.drop_path, name="drop")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = x
        return sc + y


class StarBlock_1(nn.Module):
    """1024-hidden gated block (reference :4300-4373): two grouped kxk
    branches gated relu6(f1)*f2, projel back, pooled residual."""

    c2: int
    k: int = 3
    s: int = 1
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = 1024
        pad = 1 if self.k == 3 else 0

        def branch(tag, bn_scale):
            y = MemUpdate(act=False, snn=self.snn, name=f"{tag}_act")(x, training)
            y = SnnConv(c_, self.k, self.s, pad, g=2, name=f"{tag}_conv")(y)
            return TBatchNorm(bn_scale, self.snn, name=f"{tag}_bn")(y, training)

        x1 = branch("f1", 1.0)
        x2 = branch("f2", 0.2)
        y = jax.nn.relu6(x1) * x2
        y = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="dw2_conv")(y)
        y = TBatchNorm(0.2, self.snn, name="dw2_bn")(y, training)
        y = DropPath(self.drop_path, name="drop")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = x
        return y + sc


class StarBlock_3(nn.Module):
    """StarBlock_2 with channel-expanding concat shortcut (reference :4493)."""

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
        y = SnnConv(c1, self.k, self.s, (self.k - 1) // 2, g=c1, name="dw")(y)
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
        if c1 < self.c2:
            t = MemUpdate(act=False, snn=self.snn, name="sc_act")(inp, training)
            t = SnnConv(self.c2 - c1, 1, 1, name="sc_conv")(t)
            t = TBatchNorm(1.0, self.snn, name="sc_bn")(t, training)
            sc = jnp.concatenate([t, inp], axis=-1)
        else:
            sc = inp
        return y2 + max_pool_t(sc, self.s)


class ClippedTPReLU(nn.Module):
    """Per-channel PReLU clamped at 6 (reference TPReLU/ClippedTPReLU,
    models/common.py:4934-4956).  The reference loops PReLU over T; PReLU is
    time-independent, so one elementwise op over [T,N,H,W,C] is identical."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x, training: bool = False):
        a = self.param(
            "weight", nn.initializers.constant(self.init), (x.shape[-1],)
        ).astype(x.dtype)
        y = jnp.where(x >= 0, x, a * x)
        return jnp.minimum(y, 6.0)


class StarBlock_4(nn.Module):
    """Dual-branch star block with ClippedTPReLU gate (reference :4551-4626):
    f1/f2 = mem->conv(k,s)->BN(1.0 / 0.2); x = ClippedTPReLU(x1)*x2;
    dw2 = mem->conv(k,1)->BN(0.2); pooled-1x1 shortcut when shape changes."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        inp = x

        def branch(tag, bn_scale):
            y = MemUpdate(act=False, snn=self.snn, name=f"{tag}_act")(x, training)
            y = SnnConv(self.c2, self.k, self.s, pad, name=f"{tag}_conv")(y)
            return TBatchNorm(bn_scale, self.snn, name=f"{tag}_bn")(y, training)

        x1 = branch("f1", 1.0)
        x2 = branch("f2", 0.2)
        y = ClippedTPReLU(name="act")(x1, training) * x2
        y = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="dw2_conv")(y)
        y = TBatchNorm(0.2, self.snn, name="dw2_bn")(y, training)
        y = DropPath(self.drop_path, name="drop")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(inp, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = inp
        return sc + y


class StarBlock_5(nn.Module):
    """StarBlock_4 with the EMS concat shortcut (reference :4628-4705):
    shortcut = cat([1x1-conv(x), x]) when c1 < c2, then MaxPool(1,s,s)."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        pad = 1 if self.k == 3 else 0
        inp = x

        def branch(tag, bn_scale):
            y = MemUpdate(act=False, snn=self.snn, name=f"{tag}_act")(x, training)
            y = SnnConv(self.c2, self.k, self.s, pad, name=f"{tag}_conv")(y)
            return TBatchNorm(bn_scale, self.snn, name=f"{tag}_bn")(y, training)

        x1 = branch("f1", 1.0)
        x2 = branch("f2", 0.2)
        y = ClippedTPReLU(name="act")(x1, training) * x2
        y = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y = SnnConv(self.c2, self.k, 1, pad, name="dw2_conv")(y)
        y = TBatchNorm(0.2, self.snn, name="dw2_bn")(y, training)
        y = DropPath(self.drop_path, name="drop")(y, training)
        if c1 < self.c2:
            t = MemUpdate(act=False, snn=self.snn, name="sc_act")(inp, training)
            t = SnnConv(self.c2 - c1, 1, 1, name="sc_conv")(t)
            t = TBatchNorm(1.0, self.snn, name="sc_bn")(t, training)
            out = jnp.concatenate([t, inp], axis=-1)
        else:
            out = inp
        return max_pool_t(out, self.s) + y


class StarSConv(nn.Module):
    """Separable star conv (reference :4707-4770): 1x1 expand (e*c2) ->
    depthwise k x k f1/f2 gated by relu6 -> 1x1 reduce + depthwise -> BN;
    pooled-1x1 shortcut."""

    c2: int
    k: int = 3
    s: int = 1
    e: int = 2
    drop_path: float = 0.0
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        ce = self.c2 * self.e
        pad = 1 if self.k == 3 else 0
        inp = x

        y = MemUpdate(act=False, snn=self.snn, name="dw_act")(x, training)
        y = SnnConv(ce, 1, 1, name="dw_conv")(y)
        y = TBatchNorm(1.0, self.snn, name="dw_bn")(y, training)

        def branch(z, tag, bn_scale):
            w = MemUpdate(act=False, snn=self.snn, name=f"{tag}_act")(z, training)
            w = SnnConv(ce, self.k, self.s, pad, g=ce, name=f"{tag}_conv")(w)
            return TBatchNorm(bn_scale, self.snn, name=f"{tag}_bn")(w, training)

        x1 = branch(y, "f1", 1.0)
        x2 = branch(y, "f2", 0.2)
        y = jax.nn.relu6(x1) * x2
        y = MemUpdate(act=False, snn=self.snn, name="dw2_act")(y, training)
        y = SnnConv(self.c2, 1, 1, use_bias=True, name="dw2_pw")(y)
        y = SnnConv(self.c2, self.k, 1, pad, g=self.c2, name="dw2_dw")(y)
        y = TBatchNorm(1.0, self.snn, name="dw2_bn")(y, training)
        y = DropPath(self.drop_path, name="drop")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(inp, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, use_bias=True, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = inp
        return sc + y


class MStarBlock(nn.Module):
    """MobileNet-style star block (reference :4788-4813): StarSConv ->
    Conv_3(c1*mlp) -> Conv_4(c2), with the reusable `shortcut` residual.

    NOTE: the reference only constructs ``self.shortcut`` when the shape
    changes but calls it unconditionally, so stride=1/c1==c2 crashes there;
    here the identity residual is used in that case."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    e: int = 2
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks import Shortcut

        c1 = x.shape[-1]
        if self.s != 1 or c1 != self.c2:
            x1 = Shortcut(self.c2, self.s, snn=self.snn, name="shortcut")(
                x, training
            )
        else:
            x1 = x
        y = StarSConv(c1, self.k, self.s, snn=self.snn, name="conv")(x, training)
        y = Conv_3(c1 * self.mlp_ratio, self.k, 1, snn=self.snn, name="conv2")(
            y, training
        )
        y = Conv_4(self.c2, self.k, 1, snn=self.snn, name="conv3")(y, training)
        return y + x1


class MStarBlock_2(nn.Module):
    """MStarBlock with two inverted-bottleneck 1x1 MLP stages
    (reference :4815-4852).  Same conditional-shortcut caveat as MStarBlock."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    e: int = 2
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .blocks import Shortcut

        c1 = x.shape[-1]
        if self.s != 1 or c1 != self.c2:
            x1 = Shortcut(self.c2, self.s, snn=self.snn, name="shortcut")(
                x, training
            )
        else:
            x1 = x
        y = StarSConv(c1, self.k, self.s, snn=self.snn, name="conv")(x, training)

        def mlp(z, cout, tag):
            cm = c1 * self.mlp_ratio
            w = MemUpdate(act=False, snn=self.snn, name=f"{tag}_act")(z, training)
            w = SnnConv(cm, 1, 1, use_bias=True, name=f"{tag}_up")(w)
            w = SnnConv(cm, 1, 1, g=cm, use_bias=True, name=f"{tag}_dw")(w)
            w = SnnConv(cout, 1, 1, use_bias=True, name=f"{tag}_down")(w)
            return TBatchNorm(1.0, self.snn, name=f"{tag}_bn")(w, training)

        y = mlp(y, c1, "conv2")
        y = mlp(y, self.c2, "conv3")
        return y + x1


class StarBlock_2C2f(nn.Module):
    """C2f-style CSP over StarBlock_2 bottlenecks (reference :4854-4886):
    optional Conv_3(3,2) pre-stride, Conv_3 1x1 split into 2 chunks, n
    StarBlock_2(c,c) stages, Conv_4 merge."""

    c2: int
    n: int = 1
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    drop_path: float = 0.0
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        if self.s == 2:
            x = Conv_3(x.shape[-1], 3, 2, snn=self.snn, name="cv")(x, training)
        y = Conv_3(2 * c, 1, 1, snn=self.snn, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for j in range(self.n):
            ys.append(
                StarBlock_2(
                    c, self.k, 1, self.mlp_ratio, snn=self.snn, name=f"m{j}"
                )(ys[-1], training)
            )
        y = jnp.concatenate(ys, axis=-1)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv2")(y, training)
