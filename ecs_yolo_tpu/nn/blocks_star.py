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


class MStarBlock(nn.Module):
    """StarBlock_2 wrapped with an outer residual (reference :4788-4813)."""

    c2: int
    k: int = 3
    s: int = 1
    mlp_ratio: int = 3
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        y = StarBlock_2(
            self.c2, self.k, self.s, self.mlp_ratio, snn=self.snn, name="star"
        )(x, training)
        if self.s == 1 and c1 == self.c2:
            y = y + x
        return y
