"""YOLOv9-family and CSP-hybrid blocks.

Covers reference models/common.py: RepConvN (:2760), RepNBottleneck (:2876),
RepNCSP (:2896), RepNCSPELAN4 (:2914), BasicELAN4 (:2935), and the
BasicBlock/Concat_res CSP hybrids (:2965-3048).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from .blocks import (
    SnnConv, TBatchNorm, MemUpdate, Conv_3, Conv_4,
    BasicBlock_1, BasicBlock_2, Concat_res2,
)


class RepConvN(nn.Module):
    """Rep-style 3x3+1x1 block with spiking pre-activation (reference :2760)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = MemUpdate(act=False, snn=self.snn, name="m")(x, training)
        y1 = SnnConv(self.c2, 3, self.s, 1, g=self.g, name="conv1")(y)
        y1 = TBatchNorm(1.0, self.snn, name="bn1")(y1, training)
        y2 = SnnConv(self.c2, 1, self.s, 0, g=self.g, name="conv2")(y)
        y2 = TBatchNorm(1.0, self.snn, name="bn2")(y2, training)
        return y1 + y2


class RepNBottleneck(nn.Module):
    """RepConvN -> Conv_3 bottleneck (reference :2876)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = RepConvN(c_, 3, 1, snn=self.snn, name="cv1")(x, training)
        y = Conv_3(self.c2, 3, 1, g=self.g, snn=self.snn, name="cv2")(y, training)
        return x + y if (self.shortcut and c1 == self.c2) else y


class RepNCSP(nn.Module):
    """CSP with RepNBottleneck inners (reference :2896)."""

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
            y1 = RepNBottleneck(c_, self.shortcut, self.g, 1.0, snn=self.snn,
                                name=f"m{i}")(y1, training)
        y2 = Conv_3(c_, 1, 1, snn=self.snn, name="cv2")(x, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = MemUpdate(act=False, snn=self.snn, name="cv3_act")(y, training)
        y = SnnConv(self.c2, 1, use_bias=True, name="cv3_conv")(y)
        return TBatchNorm(1.0, self.snn, name="cv3_bn")(y, training)


class RepNCSPELAN4(nn.Module):
    """GELAN block (reference :2914): split + two RepNCSP->conv branches."""

    c2: int
    c3: int = 128
    c4: int = 64
    c5: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y0 = Conv_3(self.c3, 1, 1, snn=self.snn, name="cv1")(x, training)
        half = self.c3 // 2
        ys = [y0[..., :half], y0[..., half:]]
        for bi in range(2):
            b = RepNCSP(self.c4, self.c5, snn=self.snn, name=f"csp{bi}")(
                ys[-1], training
            )
            b = Conv_3(self.c4, 3, 1, snn=self.snn, name=f"conv{bi}")(b, training)
            ys.append(b)
        return Conv_3(self.c2, 1, 1, snn=self.snn, name="cv4")(
            jnp.concatenate(ys, axis=-1), training
        )


class BasicBlock_2C3(nn.Module):
    """CSP with BasicBlock_2 inners, optional strided depthwise entry
    (reference :2965-2996)."""

    c2: int
    n: int = 1
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        if self.s == 2:
            x = MemUpdate(act=False, snn=self.snn, name="dw_act")(x, training)
            x = SnnConv(c1, self.k, self.s, 1, name="dw_conv")(x)
            x = TBatchNorm(1.0, self.snn, name="dw_bn")(x, training)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        for i in range(self.n):
            y1 = BasicBlock_2(c_, self.k, 1, snn=self.snn, name=f"m{i}")(
                y1, training
            )
        y2 = Conv_3(c_, 1, 1, snn=self.snn, name="cv2")(x, training)
        return Conv_4(self.c2, 1, snn=self.snn, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), training
        )


class BasicBlock_1C3(nn.Module):
    """CSP with BasicBlock_1 inners (reference :2998-3021)."""

    c2: int
    n: int = 1
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv_3(c_, 1, 1, snn=self.snn, name="cv1")(x, training)
        for i in range(self.n):
            y1 = BasicBlock_1(c_, self.s, snn=self.snn, name=f"m{i}")(y1, training)
        y2 = Conv_3(c_, 1, self.s, snn=self.snn, name="cv2")(x, training)
        return Conv_3(self.c2, 1, 1, snn=self.snn, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), training
        )


class Concat_res2C3(nn.Module):
    """CSP with Concat_res2 inners (reference :3023-3048)."""

    c2: int
    n: int = 1
    k: int = 3
    s: int = 1
    e: float = 0.5
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        cc = int(c_ * self.e)
        y1 = Conv_3(cc, 1, 1, snn=self.snn, name="cv1")(x, training)
        for i in range(self.n):
            y1 = Concat_res2(c_, self.k, self.s, snn=self.snn, name=f"m{i}")(
                y1, training
            )
        y2 = Conv_3(c_, 1, self.s, snn=self.snn, name="cv2")(x, training)
        return Conv_3(self.c2, 1, 1, snn=self.snn, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), training
        )
