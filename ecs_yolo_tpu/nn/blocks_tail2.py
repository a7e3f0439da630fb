"""Last slice of the experimental block tail (reference models/common.py
:3157-3268 GN / *C2f hybrids, :3264 Attention, :3407 OSRAAttention,
:3469 DynamicConv2d, :3539 TransxnetHybridTokenMixer, :3688-3755 ResNet
layers, :4055 AKConv, :4888 HetConv).

TPU translation notes (deviations carry in-place NOTEs):
* ``mem_update`` applied to token-shaped tensors (attention logits, pooled
  descriptors) uses the plain-LIF scan — the ECS spread conv is only defined
  on [T,N,H,W,C] maps (same policy as AIFI/DSSA, docs/DESIGN.md).
* ``HetConv``'s out*in ModuleList of 1-channel convs is algebraically one
  3x3 conv whose off-center taps are masked for the "1x1" (out,in) pairs —
  implemented that way (identical function class, one XLA conv).
* ``AKConv`` uses gather-based bilinear sampling (the reference's
  torch.gather path) — fully vectorized, no python loops over offsets.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from ..snn.neuron import lif_scan
from .blocks import (
    SnnConv, TBatchNorm, MemUpdate, Conv, Conv_1, Conv_3, Conv_4,
    BasicBlock_1, BasicBlock_2, Concat_res2, max_pool_t, fold_t, unfold_t,
)
from .blocks_ext import GhostBottleneck, C3, RepConv
from .blocks_tail import BasicBlock_ms


class BasicBlock_1n(nn.Module):
    """MS residual, 1024 hidden, pre-BN entry (reference BasicBlock_1n,
    models/common.py:1082-1114): BN -> spike -> 3x3 (c_=1024, stride) ->
    BN1 -> spike -> 3x3 with NO final BN; shortcut (when shape changes) =
    maxpool -> BN -> spike -> 1x1, also with NO final BN."""

    c2: int
    s: int = 1
    e: float = 0.5  # positional YAML-compat slot (reference, unused)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = 1024
        y = TBatchNorm(1.0, self.snn, name="bn0")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act1")(y, training)
        y = SnnConv(c_, 3, self.s, 1, name="conv1")(y)
        y = TBatchNorm(0.2, self.snn, name="bn1")(y, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = SnnConv(self.c2, 3, 1, 1, name="conv2")(y)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
        else:
            sc = x
        return y + sc


class BasicBlock_1m(nn.Module):
    """MS residual with a RepConv entry (reference BasicBlock_1m,
    models/common.py:1117-1143): RepConv(c1 -> 1024, stride) -> spike ->
    3x3 -> BN1; shortcut = maxpool -> spike -> 1x1 -> BN."""

    c2: int
    s: int = 1
    e: float = 0.5  # positional YAML-compat slot (reference, unused)
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = 1024
        y = RepConv(c_, 3, self.s, snn=self.snn, name="rep")(x, training)
        y = MemUpdate(act=False, snn=self.snn, name="act2")(y, training)
        y = SnnConv(self.c2, 3, 1, 1, name="conv2")(y)
        y = TBatchNorm(0.2, self.snn, name="bn2")(y, training)
        if self.s != 1 or c1 != self.c2:
            sc = max_pool_t(x, self.s)
            sc = MemUpdate(act=False, snn=self.snn, name="sc_act")(sc, training)
            sc = SnnConv(self.c2, 1, 1, name="sc_conv")(sc)
            sc = TBatchNorm(1.0, self.snn, name="sc_bn")(sc, training)
        else:
            sc = x
        return y + sc


class GN(nn.Module):
    """GroupNorm over the channel axis of [T,N,H,W,C]
    (reference GN, :3157-3166)."""

    num_groups: int = 16

    @nn.compact
    def __call__(self, x, training: bool = False):
        y, t = fold_t(x)
        y = nn.GroupNorm(num_groups=self.num_groups, name="gn")(y)
        return unfold_t(y, t)


class TPReLU(nn.Module):
    """Per-channel PReLU over [T,N,H,W,C] (reference TPReLU, :4934-4946 —
    its per-T python loop is time-independent, so one elementwise op)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x, training: bool = False):
        a = self.param(
            "weight", nn.initializers.constant(self.init), (x.shape[-1],)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


# ---------------------------------------------------------------------------
# C2f hybrids (reference :3168-3263)
# ---------------------------------------------------------------------------


def _c2f_forward(mod, x, training, c, make_bottleneck, merge_cls, pre_stride):
    """Shared C2f scaffold: optional Conv_3(3,2) pre-stride, 1x1 split into
    two chunks, n bottleneck stages on the running tail, 1x1 merge."""
    if pre_stride:
        x = Conv_3(x.shape[-1], 3, 2, snn=mod.snn, name="cv")(x, training)
    y = Conv_3(2 * c, 1, 1, snn=mod.snn, name="cv1")(x, training)
    ys = [y[..., :c], y[..., c:]]
    for j in range(mod.n):
        ys.append(make_bottleneck(j)(ys[-1], training))
    y = jnp.concatenate(ys, axis=-1)
    return merge_cls(mod.c2, 1, snn=mod.snn, name="cv2")(y, training)


class BasicBlock_2C2f(nn.Module):
    """C2f over BasicBlock_2 bottlenecks (reference :3168-3199)."""

    c2: int
    n: int = 1
    add: Any = True
    k: int = 3
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        return _c2f_forward(
            self, x, training, int(self.c2 * 0.5),
            lambda j: BasicBlock_2(
                int(self.c2 * 0.5), self.k, 1, snn=self.snn, name=f"m{j}"
            ),
            Conv_4, self.s == 2,
        )


class BasicBlock_1C2f(nn.Module):
    """C2f over BasicBlock_1 bottlenecks (reference :3201-3232); merge is
    Conv_3 (gamma=thresh BN) instead of Conv_4."""

    c2: int
    n: int = 1
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        return _c2f_forward(
            self, x, training, int(self.c2 * 0.5),
            lambda j: BasicBlock_1(
                int(self.c2 * 0.5), 1, snn=self.snn, name=f"m{j}"
            ),
            Conv_3, self.s == 2,
        )


class Concat_res2C2f(nn.Module):
    """C2f over Concat_res2 bottlenecks (reference :3234-3263).

    NOTE: the reference builds a pre-stride conv for s=2 but never calls it
    in forward, and passes ``stride=s`` into the bottlenecks, whose
    downsampled outputs can no longer concat with the s=1 chunks — s=2
    crashes there.  Only the working s=1 form is exposed."""

    c2: int
    n: int = 1
    k: int = 3
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.s == 1, "Concat_res2C2f: reference semantics define s=1 only"
        return _c2f_forward(
            self, x, training, int(self.c2 * 0.5),
            lambda j: Concat_res2(
                int(self.c2 * 0.5), self.k, 1, snn=self.snn, name=f"m{j}"
            ),
            Conv_3, False,
        )


# ---------------------------------------------------------------------------
# attention tail (reference :3264-3577)
# ---------------------------------------------------------------------------


class Attention(nn.Module):
    """Dual-axis strip-conv attention (reference Attention, :3264-3327):
    three (1xk, kx1) depthwise pairs at k=7/11/21 feed row- and column-axis
    dot-product attention; spiking neurons between every stage."""

    num_heads: int = 8
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        hd = self.num_heads
        assert c % hd == 0

        x = MemUpdate(act=False, snn=self.snn, name="m_in")(x, training)
        x1 = TBatchNorm(1.0, self.snn, name="norm1")(x, training)

        def strip(tag, k):
            a = SnnConv(c, (1, k), 1, (0, k // 2), g=c, name=f"{tag}_1")(x1)
            a = MemUpdate(act=False, snn=self.snn, name=f"{tag}_1m")(a, training)
            b = SnnConv(c, (k, 1), 1, (k // 2, 0), g=c, name=f"{tag}_2")(x1)
            b = MemUpdate(act=False, snn=self.snn, name=f"{tag}_2m")(b, training)
            return a, b

        a0, b0 = strip("conv0", 7)
        a1, b1 = strip("conv1", 11)
        a2, b2 = strip("conv2", 21)
        proj = SnnConv(c, 1, 1, use_bias=True, name="project_out")
        out1 = proj(a0 + a1 + a2)
        out1 = MemUpdate(act=False, snn=self.snn, name="m1")(out1, training)
        out2 = proj(b0 + b1 + b2)
        out2 = MemUpdate(act=False, snn=self.snn, name="m2")(out2, training)

        def heads_h(z):  # 't n h w (hd c) -> t n hd h (w c)'
            z = z.reshape(t, n, h, w, hd, c // hd)
            return z.transpose(0, 1, 4, 2, 3, 5).reshape(t, n, hd, h, -1)

        def heads_w(z):  # 't n h w (hd c) -> t n hd w (h c)'
            z = z.reshape(t, n, h, w, hd, c // hd)
            return z.transpose(0, 1, 4, 3, 2, 5).reshape(t, n, hd, w, -1)

        q1, k1, v1 = heads_h(out2), heads_h(out1), heads_h(out1)
        q2, k2, v2 = heads_w(out1), heads_w(out2), heads_w(out2)
        out3 = jnp.einsum("...ik,...jk->...ij", q1, k1) @ v1 + q1
        out4 = jnp.einsum("...ik,...jk->...ij", q2, k2) @ v2 + q2
        out3 = out3.reshape(t, n, hd, h, w, c // hd).transpose(0, 1, 3, 4, 2, 5)
        out3 = out3.reshape(t, n, h, w, c)
        out4 = out4.reshape(t, n, hd, w, h, c // hd).transpose(0, 1, 4, 3, 2, 5)
        out4 = out4.reshape(t, n, h, w, c)
        return proj(out3) + proj(out4) + x


class OSRAAttention(nn.Module):
    """Overlapping spatial-reduction attention (reference OSRA, :3407-3466).

    NOTE: neurons on token-shaped q/attn use the plain-LIF scan (module
    docstring); the spatial-reduction path keeps the full ECS neuron."""

    num_heads: int = 1
    sr_ratio: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        hd, dh = self.num_heads, c // self.num_heads
        scale = dh ** -0.5

        x = MemUpdate(act=False, snn=self.snn, name="m_in")(x, training)
        q = SnnConv(c, 1, 1, use_bias=True, name="q")(x)
        q = q.reshape(t, n, h * w, hd, dh).transpose(0, 1, 3, 2, 4)  # [t,n,hd,HW,dh]
        q = lif_scan(q, self.snn)

        if self.sr_ratio > 1:
            k_sz = self.sr_ratio + 3
            kv = MemUpdate(act=False, snn=self.snn, name="sr_m1")(x, training)
            kv = SnnConv(c, k_sz, self.sr_ratio, k_sz // 2, g=c, name="sr_c1")(kv)
            kv = TBatchNorm(1.0, self.snn, name="sr_bn1")(kv, training)
            kv = MemUpdate(act=False, snn=self.snn, name="sr_m2")(kv, training)
            kv = SnnConv(c, 1, 1, g=c, name="sr_c2")(kv)
            kv = TBatchNorm(0.2, self.snn, name="sr_bn2")(kv, training)
        else:
            kv = x
        kv = MemUpdate(act=False, snn=self.snn, name="m_kv")(kv, training)
        kv = SnnConv(c, 3, 1, 1, g=c, use_bias=True, name="local_conv")(kv) + kv
        kv = MemUpdate(act=False, snn=self.snn, name="m_kv2")(kv, training)
        kv = SnnConv(2 * c, 1, 1, use_bias=True, name="kv")(kv)
        k, v = kv[..., :c], kv[..., c:]
        hw2 = k.shape[2] * k.shape[3]
        k = k.reshape(t, n, hw2, hd, dh).transpose(0, 1, 3, 4, 2)  # [t,n,hd,dh,HW']
        v = v.reshape(t, n, hw2, hd, dh).transpose(0, 1, 3, 2, 4)  # [t,n,hd,HW',dh]

        attn = jnp.einsum("...qd,...dk->...qk", q, k) * scale
        attn = lif_scan(attn, self.snn)
        y = jnp.einsum("...qk,...kd->...qd", attn, v)  # [t,n,hd,HW,dh]
        return y.transpose(0, 1, 3, 2, 4).reshape(t, n, h, w, c)


def adaptive_avg_pool_hw(x: jax.Array, out: int) -> jax.Array:
    """AdaptiveAvgPool2d(out,out) over the H,W of [...,H,W,C] (static shapes,
    torch boundary semantics: window i = [floor(iH/out), ceil((i+1)H/out)))."""
    h, w = x.shape[-3], x.shape[-2]

    def pool_axis(z, size, axis):
        slabs = []
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)  # ceil
            slabs.append(
                jnp.mean(
                    jax.lax.slice_in_dim(z, lo, hi, axis=axis),
                    axis=axis, keepdims=True,
                )
            )
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, h, x.ndim - 3), w, x.ndim - 2)


class DynamicConv2d(nn.Module):
    """IDConv: input-conditioned depthwise kernels (reference :3469-3537).
    ``num_groups`` kernel banks are mixed by a spiking gating branch, then a
    per-sample depthwise conv runs as ONE grouped XLA conv over [1,H,W,T*N*C].
    """

    kernel_size: int = 3
    reduction_ratio: int = 4
    num_groups: int = 2
    use_bias: bool = True
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c = x.shape
        kk, g = self.kernel_size, self.num_groups
        trunc = nn.initializers.truncated_normal(stddev=0.02)
        bank = self.param("weight", trunc, (g, kk, kk, c))
        x = MemUpdate(act=False, snn=self.snn, name="m_in")(x, training)

        def gating(z, tag):
            z = MemUpdate(act=False, snn=self.snn, name=f"{tag}_m1")(z, training)
            z = SnnConv(c // self.reduction_ratio, 1, 1, use_bias=True,
                        name=f"{tag}_c1")(z)
            z = TBatchNorm(1.0, self.snn, name=f"{tag}_bn")(z, training)
            z = MemUpdate(act=False, snn=self.snn, name=f"{tag}_m2")(z, training)
            return SnnConv(c * g, 1, 1, use_bias=True, name=f"{tag}_c2")(z)

        # kernel mixing weights from a kk x kk pooled descriptor
        scale = gating(adaptive_avg_pool_hw(x, kk), "proj")  # [t,n,kk,kk,c*g]
        scale = lif_scan(scale, self.snn)
        scale = scale.reshape(t, n, kk, kk, g, c)
        weight = jnp.einsum("tnxyge,gxye->tnxye", scale, bank)  # [t,n,kk,kk,c]

        if self.use_bias:
            bbank = self.param("bias", trunc, (g, c))
            bs = gating(jnp.mean(x, axis=(2, 3), keepdims=True), "projb")
            bs = lif_scan(bs, self.snn).reshape(t, n, g, c)
            bias = jnp.einsum("tnge,ge->tne", bs, bbank)  # [t,n,c]
        else:
            bias = None

        # per-(t,n,c) depthwise conv: fold everything into feature groups
        xi = x.transpose(2, 3, 0, 1, 4).reshape(1, h, w, t * n * c)
        wi = weight.transpose(2, 3, 0, 1, 4).reshape(kk, kk, 1, t * n * c)
        y = jax.lax.conv_general_dilated(
            xi, wi.astype(xi.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=t * n * c,
        )
        y = y.reshape(h, w, t, n, c).transpose(2, 3, 0, 1, 4)
        if bias is not None:
            y = y + bias[:, :, None, None, :]
        return y


class TransxnetHybridTokenMixer(nn.Module):
    """D-Mixer (reference :3539-3575): DynamicConv2d on one channel half,
    OSRAAttention on the other, then a squeeze-excite-style projection with
    residual."""

    kernel_size: int = 3
    num_groups: int = 2
    num_heads: int = 1
    sr_ratio: int = 1
    reduction_ratio: int = 8
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        assert c % 2 == 0
        x1 = DynamicConv2d(
            self.kernel_size, 4, self.num_groups, snn=self.snn, name="local"
        )(x[..., : c // 2], training)
        x2 = OSRAAttention(
            self.num_heads, self.sr_ratio, snn=self.snn, name="global"
        )(x[..., c // 2 :], training)
        y = jnp.concatenate([x1, x2], axis=-1)
        inner = max(16, c // self.reduction_ratio)
        z = MemUpdate(act=False, snn=self.snn, name="p_m1")(y, training)
        z = SnnConv(c, 3, 1, 1, g=c, use_bias=True, name="p_c1")(z)
        z = TBatchNorm(1.0, self.snn, name="p_bn1")(z, training)
        z = MemUpdate(act=False, snn=self.snn, name="p_m2")(z, training)
        z = SnnConv(inner, 1, 1, use_bias=True, name="p_c2")(z)
        z = TBatchNorm(1.0, self.snn, name="p_bn2")(z, training)
        z = MemUpdate(act=False, snn=self.snn, name="p_m3")(z, training)
        z = SnnConv(c, 1, 1, use_bias=True, name="p_c3")(z)
        z = TBatchNorm(0.2, self.snn, name="p_bn3")(z, training)
        return z + y


# ---------------------------------------------------------------------------
# HetConv / AKConv / ResNet layers
# ---------------------------------------------------------------------------


def _hetconv_mask(c1: int, c2: int, p: int) -> jnp.ndarray:
    """The reference's cyclic 3x3/1x1 filter pattern (:4888-4916): row k of
    the [c2, c1] matrix is the base pattern rotated right k times, where the
    base has a 3x3 kernel every (1 + interval) inputs."""
    num_k3 = c1 // p
    num_k1 = c1 - num_k3
    interval = num_k1 // max(num_k3, 1)
    base = []
    for _ in range(num_k3):
        base.append(1)
        base.extend([0] * interval)
    base = (base + [0] * c1)[:c1]
    rows = []
    cur = list(base)
    for k in range(c2):
        if k > 0:
            cur = [cur[-1]] + cur[:-1]
        rows.append(list(cur))
    return jnp.asarray(rows, jnp.float32)  # [c2, c1], 1 = 3x3 tap


class HetConv(nn.Module):
    """Heterogeneous conv (reference :4888-4931): each (out, in) pair uses a
    3x3 or 1x1 kernel in a cyclic pattern.  The reference instantiates
    c2*c1 one-channel convs in python; algebraically this is ONE 3x3 conv
    with off-center taps masked for the 1x1 pairs — implemented that way."""

    c2: int
    s: int = 1
    p: int = 4
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        k3 = self.param(
            "w3",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (3, 3, c1, self.c2),
        )
        b = self.param("bias", nn.initializers.zeros, (self.c2,))
        mask = _hetconv_mask(c1, self.c2, self.p)  # [c2, c1]
        center = jnp.zeros((3, 3), k3.dtype).at[1, 1].set(1.0)
        m = mask.T[None, None]  # [1,1,c1,c2]
        weight = k3 * (m + (1.0 - m) * center[:, :, None, None])
        y, t = fold_t(x)
        y = jax.lax.conv_general_dilated(
            y, weight.astype(y.dtype), (self.s, self.s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(y.dtype)
        return unfold_t(y, t)


class AKConv(nn.Module):
    """Arbitrary-kernel deformable conv (reference AKConv, :4055-4197):
    a 3x3 conv predicts 2*num_param offsets; features are bilinearly
    gathered at base-grid+offset positions, stacked along H, and reduced by
    a (num_param,1)/(num_param,1) spiking conv."""

    c2: int
    num_param: int = 5
    s: int = 1
    snn: SNNConfig = DEFAULT_SNN

    def _base_offsets(self):
        np_ = self.num_param
        base = round(math.sqrt(np_))
        rows, mod = np_ // base, np_ % base
        py, px = [], []
        for r in range(rows):
            for ccol in range(base):
                py.append(r)
                px.append(ccol)
        for ccol in range(mod):
            py.append(rows)
            px.append(ccol)
        return jnp.asarray(py, jnp.float32), jnp.asarray(px, jnp.float32)

    @nn.compact
    def __call__(self, x, training: bool = False):
        t, n, h, w, c1 = x.shape
        np_ = self.num_param
        # zero-init weights per reference: offsets start at the base grid
        offset = SnnConv(
            2 * np_, 3, self.s, 1, use_bias=True,
            kernel_init=nn.initializers.zeros, name="p_conv",
        )(x)  # [t,n,ho,wo,2*np]
        ho, wo = offset.shape[2], offset.shape[3]
        off_y, off_x = offset[..., :np_], offset[..., np_:]
        # reference scales offset grads by 0.1 via a backward hook
        off_y = 0.1 * off_y + 0.9 * jax.lax.stop_gradient(off_y)
        off_x = 0.1 * off_x + 0.9 * jax.lax.stop_gradient(off_x)

        base_y, base_x = self._base_offsets()
        gy = jnp.arange(ho, dtype=jnp.float32)[:, None] * self.s
        gx = jnp.arange(wo, dtype=jnp.float32)[None, :] * self.s
        py = gy[..., None] + base_y + off_y  # [t,n,ho,wo,np]
        px = gx[..., None] + base_x + off_x
        py = jnp.clip(py, 0, h - 1)
        px = jnp.clip(px, 0, w - 1)

        y0 = jnp.floor(jax.lax.stop_gradient(py))
        x0 = jnp.floor(jax.lax.stop_gradient(px))
        y1, x1 = y0 + 1, x0 + 1
        y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)
        x0c, x1c = jnp.clip(x0, 0, w - 1), jnp.clip(x1, 0, w - 1)

        flat = x.reshape(t, n, h * w, c1)

        def gather(yy, xx):
            idx = (yy * w + xx).astype(jnp.int32).reshape(t, n, -1)  # [t,n,ho*wo*np]
            out = jnp.take_along_axis(flat, idx[..., None], axis=2)
            return out.reshape(t, n, ho, wo, np_, c1)

        g_lt = (1 + (y0c - py)) * (1 + (x0c - px))
        g_rb = (1 - (y1c - py)) * (1 - (x1c - px))
        g_lb = (1 + (y0c - py)) * (1 - (x1c - px))
        g_rt = (1 - (y1c - py)) * (1 + (x0c - px))
        samp = (
            g_lt[..., None] * gather(y0c, x0c)
            + g_rb[..., None] * gather(y1c, x1c)
            + g_lb[..., None] * gather(y0c, x1c)
            + g_rt[..., None] * gather(y1c, x0c)
        )  # [t,n,ho,wo,np,c1]
        # stack samples along H: 't n h w np c -> t n (h np) w c'
        samp = samp.transpose(0, 1, 2, 4, 3, 5).reshape(t, n, ho * np_, wo, c1)
        y = MemUpdate(act=False, snn=self.snn, name="m")(samp, training)
        y = SnnConv(self.c2, (np_, 1), (np_, 1), 0, name="conv")(y)
        return TBatchNorm(1.0, self.snn, name="bn")(y, training)


class ResNetBlock(nn.Module):
    """Standard bottleneck ResNet block on spiking convs (reference :3688)."""

    c2: int
    s: int = 1
    e: int = 4
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        c3 = self.e * self.c2
        c1 = x.shape[-1]
        y = Conv(self.c2, 1, 1, snn=self.snn, name="cv1")(x, training)
        y = Conv(self.c2, 3, self.s, 1, snn=self.snn, name="cv2")(y, training)
        y = Conv_1(c3, 1, snn=self.snn, name="cv3")(y, training)
        if self.s != 1 or c1 != c3:
            sc = Conv_1(c3, 1, self.s, snn=self.snn, name="shortcut")(x, training)
        else:
            sc = x
        return jax.nn.relu(y + sc)


class ResNetLayerBasic(nn.Module):
    """ResNet stage (reference :3705-3727): first stage = 7x7/2 Conv_1 stem;
    later stages = n GhostBottlenecks (first carries the stride)."""

    c2: int
    k: int = 1
    s: int = 1
    is_first: bool = False
    n: int = 1
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.is_first:
            return Conv_1(self.c2, 7, 2, 3, snn=self.snn, name="stem")(
                x, training
            )
        y = GhostBottleneck(self.c2, self.k, self.s, snn=self.snn, name="b0")(
            x, training
        )
        for j in range(1, self.n):
            y = GhostBottleneck(self.c2, self.k, 1, snn=self.snn, name=f"b{j}")(
                y, training
            )
        return y


class ResNetLayerBo(nn.Module):
    """ResNet stage, C3 body (reference :3729-3749): first stage = 7x7/2
    Conv_1 + 3x3/2 max pool; later stages = C3(c1, c2, n)."""

    c2: int
    k: int = 1
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.is_first:
            y = Conv_1(self.c2, 7, 2, 3, snn=self.snn, name="stem")(x, training)
            return max_pool_t(y, 2)
        return C3(self.c2, self.n, snn=self.snn, name="c3")(x, training)


class BasicBlock_ms1(BasicBlock_ms):
    """Alias of BasicBlock_ms.  The reference declares BasicBlock_ms1 as an
    EMPTY stub (models/common.py:2598-2600), so res18-eebk.yaml cannot build
    there; aliasing the working _ms block makes the config functional here
    (documented deviation)."""
