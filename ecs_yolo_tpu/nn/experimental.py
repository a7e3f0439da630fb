"""Experimental blocks (reference models/experimental.py: CrossConv, Sum,
MixConv2d — Ensemble lives in hub.py)."""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from .blocks import SnnConv, TBatchNorm, Conv


class CrossConv(nn.Module):
    """Cross-convolution downsample: (1,k) then (k,1) spiking convs
    (reference experimental.py:11-22)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, (1, self.k), (1, self.s), snn=self.snn, name="cv1")(
            x, training
        )
        y = Conv(self.c2, (self.k, 1), (self.s, 1), g=self.g, snn=self.snn,
                 name="cv2")(y, training)
        return x + y if (self.shortcut and c1 == self.c2) else y


class Sum(nn.Module):
    """(Optionally weighted) sum of inputs (reference experimental.py:25-43)."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        y = xs[0]
        if self.weight:
            w0 = -jnp.arange(1.0, self.n) / 2
            w = self.param("w", lambda k: w0)
            gains = jax.nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * gains[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(nn.Module):
    """Mixed-kernel depthwise conv (reference experimental.py:46-68),
    equal-channels strategy."""

    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        n = len(self.k)
        idx = np.floor(np.linspace(0, n - 1e-6, self.c2)).astype(int)
        outs = []
        for gi, kk in enumerate(self.k):
            cg = int((idx == gi).sum())
            if cg == 0:
                continue
            outs.append(
                SnnConv(cg, kk, self.s, kk // 2, g=math.gcd(c1, cg),
                        name=f"m{gi}")(x)
            )
        y = jnp.concatenate(outs, axis=-1)
        y = TBatchNorm(1.0, self.snn, name="bn")(y, training)
        return jax.nn.silu(y)
