"""Detection heads.

TPU-native equivalents of the reference heads:
* ``Detect``   — v1 anchor-based, learned Conv_7 T-collapse
  (reference models/yolo.py:50-161).
* ``DDetect``  — anchor-free DFL head with spiking Conv_B towers, mean over T
  (reference models/yolo_snn.py:83-139).
* ``DualDDetect`` — aux+main branch deep-supervision head
  (reference models/yolo_snn.py:142-282).
* ``v10Detect`` — NMS-free one2one/one2many head
  (reference models/yolo_snn.py:499-592).

All heads take a list of [T,N,H,W,C] feature maps.  In training mode they
return raw per-level tensors (layout documented per head); in inference mode
they additionally return decoded, image-space predictions.  Grids/anchors are
computed from static shapes, so XLA constant-folds them.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from ..ops.anchors import make_anchors, dist2bbox, make_grid_v1
from .blocks import SnnConv, Conv, Conv_B, Conv_7, DFL, MemUpdate


def make_divisible(x, divisor: int):
    return math.ceil(x / divisor) * divisor


class Detect(nn.Module):
    """v1 anchor-based head.

    Per level: 1x1 SnnConv -> Conv_7 (learned T-collapse) -> reshape to
    [N, na, ny, nx, no].  Inference decode:
      xy = (sig*2 - 0.5 + grid) * stride ;  wh = (sig*2)^2 * anchor * stride.

    ``anchors`` are in *grid units* (already divided by stride, as the
    reference does at build time, models/yolo.py:230-236).
    """

    nc: int = 80
    anchors: Tuple[Tuple[float, ...], ...] = ()
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        nl, na, no = self.nl, self.na, self.no
        anchors = jnp.asarray(self.anchors, dtype=jnp.float32).reshape(nl, na, 2)
        feats = []
        for i, x in enumerate(xs):
            y = SnnConv(no * na, 1, use_bias=True, name=f"m{i}")(x)  # [T,N,h,w,na*no]
            y = Conv_7(snn=self.snn, name=f"w{i}")(y)  # [N,h,w,na*no]
            n, ny, nx, _ = y.shape
            # channel index = a*no + o  (reference view(bs, na, no, ny, nx))
            y = y.reshape(n, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
            feats.append(y)  # [N, na, ny, nx, no]

        if training:
            return feats

        z = []
        for i, y in enumerate(feats):
            n, _, ny, nx, _ = y.shape
            stride = float(self.strides[i])
            grid = make_grid_v1(nx, ny, na, dtype=y.dtype)
            anchor_grid = (anchors[i] * stride).reshape(1, na, 1, 1, 2).astype(y.dtype)
            sig = jax.nn.sigmoid(y)
            xy = (sig[..., 0:2] * 2 - 0.5 + grid) * stride
            wh = (sig[..., 2:4] * 2) ** 2 * anchor_grid
            out = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
            z.append(out.reshape(n, -1, no))
        return jnp.concatenate(z, axis=1), feats


def _mean_t(x: jax.Array) -> jax.Array:
    """Rate-code collapse: mean over the time axis
    (reference ``x.sum(0)/T``, models/yolo_snn.py:115-116)."""
    return jnp.mean(x, axis=0)


class _DFLTower(nn.Module):
    """cv2 branch: Conv_B -> Conv_B(g=4) -> 1x1 SnnConv(4*reg_max)."""

    c2: int
    reg_max: int
    snn: SNNConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv_B(self.c2, 3, snn=self.snn, name="0")(x, training)
        y = Conv_B(self.c2, 3, g=4, snn=self.snn, name="1")(y, training)
        return SnnConv(4 * self.reg_max, 1, g=4, use_bias=True, name="2")(y)


class _ClsTower(nn.Module):
    """cv3 branch: Conv_B -> Conv_B -> 1x1 SnnConv(nc)."""

    c3: int
    nc: int
    snn: SNNConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv_B(self.c3, 3, snn=self.snn, name="0")(x, training)
        y = Conv_B(self.c3, 3, snn=self.snn, name="1")(y, training)
        return SnnConv(self.nc, 1, use_bias=True, name="2")(y)


class _V10ClsTower(nn.Module):
    """v10 lightweight cls branch (reference models/yolo_snn.py:505-508):
    (Conv_B depthwise 3x3 -> Conv_B 1x1) x2 -> 1x1 SnnConv(nc)."""

    c3: int
    nc: int
    snn: SNNConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        y = Conv_B(c1, 3, g=c1, snn=self.snn, name="0_0")(x, training)
        y = Conv_B(self.c3, 1, snn=self.snn, name="0_1")(y, training)
        y = Conv_B(self.c3, 3, g=self.c3, snn=self.snn, name="1_0")(y, training)
        y = Conv_B(self.c3, 1, snn=self.snn, name="1_1")(y, training)
        return SnnConv(self.nc, 1, use_bias=True, name="2")(y)


def _decode_dfl(feats_nchw, nc, reg_max, strides, dfl_mod, training):
    """Shared DFL decode: feats per level [N, no, h, w] -> (y, anchor info).

    Returns y = [N, 4+nc, A] with boxes in input-image pixels (xywh).
    """
    shapes = [(f.shape[2], f.shape[3]) for f in feats_nchw]
    n = feats_nchw[0].shape[0]
    no = nc + reg_max * 4
    flat = jnp.concatenate([f.reshape(n, no, -1) for f in feats_nchw], axis=2)
    box, cls = flat[:, : reg_max * 4], flat[:, reg_max * 4 :]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5, flat.dtype)
    dist = dfl_mod(box, training)  # [N, 4, A]
    dbox = dist2bbox(dist, anchor_points.T[None], xywh=True, axis=1)
    dbox = dbox * stride_tensor.T[None]
    return jnp.concatenate([dbox, jax.nn.sigmoid(cls)], axis=1)


class DDetect(nn.Module):
    """Anchor-free DFL head with spiking towers; mean-over-T rate collapse.

    Training output: list of [N, no, h, w] per level (no = nc + 4*reg_max) —
    layout chosen to match what the TAL loss consumes.
    Inference: (y, feats) with y = [N, 4+nc, A] decoded boxes (pixels, xywh).
    """

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        ch0 = xs[0].shape[-1]
        c2 = make_divisible(max(ch0 // 4, self.reg_max * 4, 16), 4)
        c3 = max(ch0, min(self.nc * 2, 128))
        feats = []
        for i, x in enumerate(xs):
            box = _mean_t(_DFLTower(c2, self.reg_max, self.snn, name=f"cv2_{i}")(x, training))
            cls = _mean_t(_ClsTower(c3, self.nc, self.snn, name=f"cv3_{i}")(x, training))
            y = jnp.concatenate([box, cls], axis=-1)  # [N,h,w,no]
            feats.append(y.transpose(0, 3, 1, 2))  # [N,no,h,w]

        dfl = DFL(self.reg_max, name="dfl")
        if training:
            # touch DFL so params exist regardless of mode (it has none, but
            # keeps the module tree stable)
            return feats
        y = _decode_dfl(feats, self.nc, self.reg_max, self.strides, dfl, training)
        return y, feats


class DualDDetect(nn.Module):
    """Dual-branch (aux + main) DFL head for deep supervision
    (reference models/yolo_snn.py:142-282).  Takes 2*nl feature maps:
    first nl feed the aux branch (d1), last nl the main branch (d2).

    Training: (d1_feats, d2_feats) each a list of [N,no,h,w].
    Inference: (y, (d1_feats, d2_feats)) with y decoded from the MAIN branch.
    """

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        nl = len(xs) // 2
        a_in, b_in = xs[:nl], xs[nl:]

        def branch(inputs, tag):
            ch0 = inputs[0].shape[-1]
            c2 = make_divisible(max(ch0 // 4, self.reg_max * 4, 16), 4)
            c3 = max(ch0, min(self.nc * 2, 128))
            out = []
            for i, x in enumerate(inputs):
                box = _mean_t(
                    _DFLTower(c2, self.reg_max, self.snn, name=f"{tag}cv2_{i}")(x, training)
                )
                cls = _mean_t(
                    _ClsTower(c3, self.nc, self.snn, name=f"{tag}cv3_{i}")(x, training)
                )
                out.append(jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2))
            return out

        d1 = branch(a_in, "a_")
        d2 = branch(b_in, "b_")
        dfl2 = DFL(self.reg_max, name="dfl2")
        if training:
            return d1, d2
        y = _decode_dfl(d2, self.nc, self.reg_max, self.strides, dfl2, training)
        return y, (d1, d2)


class TripleDDetect(nn.Module):
    """Triple-branch deep-supervision head (reference models/yolo_snn.py:284-448):
    three DFL branches over 3*nl inputs; inference decodes the LAST branch."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        nl = len(xs) // 3
        groups = [xs[:nl], xs[nl : 2 * nl], xs[2 * nl :]]

        def branch(inputs, tag):
            ch0 = inputs[0].shape[-1]
            c2 = make_divisible(max(ch0 // 4, self.reg_max * 4, 16), 4)
            c3 = max(ch0, min(self.nc * 2, 128))
            out = []
            for i, x in enumerate(inputs):
                box = _mean_t(
                    _DFLTower(c2, self.reg_max, self.snn, name=f"{tag}cv2_{i}")(x, training)
                )
                cls = _mean_t(
                    _ClsTower(c3, self.nc, self.snn, name=f"{tag}cv3_{i}")(x, training)
                )
                out.append(jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2))
            return out

        ds = [branch(g, f"{'abc'[k]}_") for k, g in enumerate(groups)]
        dfl = DFL(self.reg_max, name="dfl3")
        if training:
            return tuple(ds)
        y = _decode_dfl(ds[-1], self.nc, self.reg_max, self.strides, dfl, training)
        return y, tuple(ds)


class _DFLTowerPlain(nn.Module):
    """Plain-`Conv` box tower (reference DualDetect cv2/cv4,
    models/yolo_snn.py:161-166: Conv -> Conv -> 1x1 conv, no groups)."""

    c2: int
    reg_max: int
    snn: SNNConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv(self.c2, 3, snn=self.snn, name="0")(x, training)
        y = Conv(self.c2, 3, snn=self.snn, name="1")(y, training)
        return SnnConv(4 * self.reg_max, 1, use_bias=True, name="2")(y)


class _ClsTowerPlain(nn.Module):
    """Plain-`Conv` cls tower (reference DualDetect cv3/cv5)."""

    c3: int
    nc: int
    snn: SNNConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv(self.c3, 3, snn=self.snn, name="0")(x, training)
        y = Conv(self.c3, 3, snn=self.snn, name="1")(y, training)
        return SnnConv(self.nc, 1, use_bias=True, name="2")(y)


def _plain_branch(inputs, tag, nc, reg_max, snn, training):
    ch0 = inputs[0].shape[-1]
    c2 = max(ch0 // 4, reg_max * 4, 16)
    c3 = max(ch0, min(nc * 2, 128))
    out = []
    for i, x in enumerate(inputs):
        box = _mean_t(
            _DFLTowerPlain(c2, reg_max, snn, name=f"{tag}cv2_{i}")(x, training)
        )
        cls = _mean_t(
            _ClsTowerPlain(c3, nc, snn, name=f"{tag}cv3_{i}")(x, training)
        )
        out.append(jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2))
    return out


class DualDetect(nn.Module):
    """Dual-branch head with plain `Conv` towers (reference
    models/yolo_snn.py:142-203).

    NOTE: the reference forward concatenates tower outputs on dim=1 of a
    5-D [T,B,C,H,W] tensor (a 4-D-era leftover), so it cannot actually run
    on the SNN backbone; here the towers are followed by the mean-over-T
    rate collapse like DualDDetect, making the head functional.  Inference
    decodes the MAIN branch (d2)."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        nl = len(xs) // 2
        d1 = _plain_branch(xs[:nl], "a_", self.nc, self.reg_max, self.snn, training)
        d2 = _plain_branch(xs[nl:], "b_", self.nc, self.reg_max, self.snn, training)
        dfl2 = DFL(self.reg_max, name="dfl2")
        if training:
            return d1, d2
        y = _decode_dfl(d2, self.nc, self.reg_max, self.strides, dfl2, training)
        return y, (d1, d2)


class TripleDetect(nn.Module):
    """Triple-branch head with plain `Conv` towers (reference
    models/yolo_snn.py:284-363).  Same 5-D NOTE as DualDetect; inference
    decodes the LAST branch."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        nl = len(xs) // 3
        ds = [
            _plain_branch(
                xs[k * nl : (k + 1) * nl], f"{'abc'[k]}_",
                self.nc, self.reg_max, self.snn, training,
            )
            for k in range(3)
        ]
        dfl = DFL(self.reg_max, name="dfl3")
        if training:
            return tuple(ds)
        y = _decode_dfl(ds[-1], self.nc, self.reg_max, self.strides, dfl, training)
        return y, tuple(ds)


class V10Output(NamedTuple):
    """NMS-free head output (reference ModelOutput, models/yolo_snn.py:589)."""

    one2many: Any
    one2one: Any


class v10Detect(nn.Module):
    """YOLOv10-style NMS-free head: a one2many branch (DDetect towers) plus a
    one2one branch fed by detached features (reference models/yolo_snn.py:499).

    Training: V10Output(one2many=[...], one2one=[...]) of per-level [N,no,h,w].
    Inference: V10Output(one2many=[...feats...], one2one=(y, feats)).
    """

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    max_det: int = 300
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        ch0 = xs[0].shape[-1]
        c2 = make_divisible(max(ch0 // 4, self.reg_max * 4, 16), 4)
        c3_many = max(ch0, min(self.nc * 2, 128))
        c3_one = max(ch0, min(self.nc, 100))

        one2many = []
        for i, x in enumerate(xs):
            box = _mean_t(_DFLTower(c2, self.reg_max, self.snn, name=f"cv2_{i}")(x, training))
            cls = _mean_t(_V10ClsTower(c3_one, self.nc, self.snn, name=f"cv3_{i}")(x, training))
            one2many.append(jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2))

        one2one = []
        for i, x in enumerate(xs):
            xd = jax.lax.stop_gradient(x)
            box = _mean_t(
                _DFLTower(c2, self.reg_max, self.snn, name=f"one2one_cv2_{i}")(xd, training)
            )
            cls = _mean_t(
                _V10ClsTower(c3_one, self.nc, self.snn, name=f"one2one_cv3_{i}")(xd, training)
            )
            one2one.append(jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2))

        dfl = DFL(self.reg_max, name="dfl")
        if training:
            return V10Output(one2many=one2many, one2one=one2one)
        y = _decode_dfl(one2one, self.nc, self.reg_max, self.strides, dfl, training)
        return V10Output(one2many=one2many, one2one=(y, one2one))


class ASFF_DDetect(nn.Module):
    """DDetect with ASFF2 adaptive fusion of the input pyramid
    (reference models/yolo_snn.py:594-606).  Matches the reference's
    sequential in-place update: level i's fusion consumes the already-fused
    shallower levels."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        from .blocks_ext import ASFF2  # local import avoids a cycle

        xs = list(xs[::-1])  # deepest first, as ASFF expects
        for i in range(len(xs)):
            xs[i] = ASFF2(level=i, snn=self.snn, name=f"asff{i}")(xs, training)
        xs = xs[::-1]
        return DDetect(
            self.nc, self.reg_max, self.strides, self.snn, name="det"
        )(xs, training)


class ASFF_v10Detect(nn.Module):
    """v10Detect with ASFF2 fusion (reference models/yolo_snn.py:608-620)."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    max_det: int = 300
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        from .blocks_ext import ASFF2

        xs = list(xs[::-1])
        for i in range(len(xs)):
            xs[i] = ASFF2(level=i, snn=self.snn, name=f"asff{i}")(xs, training)
        xs = xs[::-1]
        return v10Detect(
            self.nc, self.reg_max, self.strides, self.max_det, self.snn,
            name="det",
        )(xs, training)


HEAD_NAMES = (
    "Detect", "DDetect", "DualDetect", "DualDDetect",
    "TripleDetect", "TripleDDetect", "v10Detect",
    "ASFF_DDetect", "ASFF_v10Detect", "Segment", "Panoptic",
)
