"""Segmentation / panoptic heads (reference models/yolo_snn.py:450-497).

The reference inherits these YOLOv9 heads without SNN awareness and ships no
YAML using them (SURVEY §2.3); here they are rebuilt on the spiking DDetect
towers with mean-over-T rate collapse so they run on the same [T,N,H,W,C]
features as everything else.

Training output: (det_feats, mask_coeffs [N, nm, A], protos [N, ph, pw, nm])
— plus a semantic map for Panoptic.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SNNConfig, DEFAULT_SNN
from .blocks import SnnConv, Conv, Sample
from .heads import DDetect, _mean_t, _DFLTower, _ClsTower, _decode_dfl, make_divisible
from .blocks import DFL


class Proto(nn.Module):
    """Mask prototype generator (reference Proto): conv -> up2 -> conv -> 1x1."""

    npr: int = 256
    nm: int = 32
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv(self.npr, 3, snn=self.snn, name="cv1")(x, training)
        y = Sample(None, 2, "nearest", name="up")(y, training)
        y = Conv(self.npr // 2, 3, snn=self.snn, name="cv2")(y, training)
        y = Conv(self.nm, 1, snn=self.snn, name="cv3")(y, training)
        return _mean_t(y)  # [N, ph, pw, nm]


class Segment(nn.Module):
    """Instance segmentation head: DDetect + mask coefficients + protos."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        ch0 = xs[0].shape[-1]
        c2 = make_divisible(max(ch0 // 4, self.reg_max * 4, 16), 4)
        c3 = max(ch0, min(self.nc * 2, 128))
        c4 = max(ch0 // 4, self.nm)

        protos = Proto(self.npr, self.nm, snn=self.snn, name="proto")(
            xs[0], training
        )
        mcs = []
        feats = []
        for i, x in enumerate(xs):
            box = _mean_t(_DFLTower(c2, self.reg_max, self.snn, name=f"cv2_{i}")(x, training))
            cls = _mean_t(_ClsTower(c3, self.nc, self.snn, name=f"cv3_{i}")(x, training))
            feats.append(
                jnp.concatenate([box, cls], axis=-1).transpose(0, 3, 1, 2)
            )
            m = Conv(c4, 3, snn=self.snn, name=f"cv4_{i}_0")(x, training)
            m = Conv(c4, 3, snn=self.snn, name=f"cv4_{i}_1")(m, training)
            m = _mean_t(SnnConv(self.nm, 1, use_bias=True, name=f"cv4_{i}_2")(m))
            n = m.shape[0]
            mcs.append(m.reshape(n, -1, self.nm).transpose(0, 2, 1))
        mc = jnp.concatenate(mcs, axis=2)  # [N, nm, A]

        dfl = DFL(self.reg_max, name="dfl")
        if training:
            return feats, mc, protos
        y = _decode_dfl(feats, self.nc, self.reg_max, self.strides, dfl, training)
        return jnp.concatenate([y, mc], axis=1), (feats, mc, protos)


class UConv(nn.Module):
    """Semantic upsampling conv (reference UConv): conv -> up2 -> 1x1."""

    c_hidden: int
    c_out: int
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = Conv(self.c_hidden, 3, snn=self.snn, name="cv1")(x, training)
        y = Sample(None, 2, "nearest", name="up")(y, training)
        y = SnnConv(self.c_out, 1, use_bias=True, name="cv2")(y)
        return _mean_t(y)


class Panoptic(nn.Module):
    """Panoptic head (reference models/yolo_snn.py:473-497): Segment plus a
    semantic-segmentation branch over P3."""

    nc: int = 80
    sem_nc: int = 93
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    strides: Tuple[float, ...] = ()
    snn: SNNConfig = DEFAULT_SNN

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], training: bool = False):
        seg = Segment(
            self.nc, self.nm, self.npr, self.reg_max, self.strides,
            self.snn, name="seg",
        )
        sem = UConv(
            xs[0].shape[-1] // 4, self.sem_nc + self.nc, self.snn, name="uconv"
        )(xs[0], training)
        out = seg(xs, training)
        if training:
            feats, mc, protos = out
            return feats, mc, protos, sem
        y, aux = out
        return y, (*aux, sem)


def crop_mask(masks, boxes):
    """Zero mask pixels outside the box (reference utils/segment/general.py).
    masks [N, h, w], boxes xyxy in mask coords."""
    h, w = masks.shape[1:3]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    keep = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return masks * keep


def segment_mask_loss(
    mc: jax.Array,  # [N, nm, A]
    protos: jax.Array,  # [N, ph, pw, nm]
    fg_mask: jax.Array,  # [N, A]
    target_gt_idx: jax.Array,  # [N, A]
    gt_masks: jax.Array,  # [N, M, ph, pw]
    target_bboxes: jax.Array,  # [N, A, 4] xyxy in input pixels
    stride0: float,
):
    """Proto-coefficient mask BCE (reference utils/segment/loss_tal.py):
    pred_mask = sigma(protos @ coeff), BCE vs the assigned gt mask, cropped
    to the assigned box, normalized by box area."""
    n, ph, pw, nm = protos.shape
    pred = jnp.einsum("nhwm,nma->nahw", protos, mc)  # logits [N, A, ph, pw]
    tgt = jnp.take_along_axis(
        gt_masks, target_gt_idx[:, :, None, None], axis=1
    )  # [N, A, ph, pw]
    bce = jnp.maximum(pred, 0) - pred * tgt + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    # crop to assigned boxes (in proto coords: stride0 / 2 upsample factor)
    scale = 2.0 / stride0
    boxes_m = target_bboxes * scale
    crop = crop_mask(
        bce.reshape(n * pred.shape[1], ph, pw),
        boxes_m.reshape(-1, 4),
    ).reshape(bce.shape)
    area = jnp.clip(
        (boxes_m[..., 2] - boxes_m[..., 0]) * (boxes_m[..., 3] - boxes_m[..., 1]),
        1.0,
    )
    per_anchor = crop.sum(axis=(2, 3)) / area
    return jnp.where(fg_mask, per_anchor, 0.0).sum() / jnp.maximum(
        fg_mask.sum(), 1
    )


def compute_loss_segment(
    out,  # training output: (feats, mc, protos) or (feats, mc, protos, sem)
    targets,  # [B, M, 5]
    t_mask,  # [B, M]
    gt_masks,  # [B, M, ph, pw] binary instance masks at proto resolution
    strides,
    nc: int,
    mask_gain: float = 2.5,
):
    """Composite detection + proto-mask loss (reference
    utils/segment/loss_tal.py:170-252: box 7.5, mask 2.5/bs, cls 0.5,
    dfl 1.5).  Returns (total*bs, (box, mask, cls, dfl))."""
    from ..train.loss_tal import compute_loss_tal

    feats, mc, protos = out[0], out[1], out[2]
    B = feats[0].shape[0]
    det_total, det_items, assign = compute_loss_tal(
        feats, targets, t_mask, strides, nc, return_assign=True
    )
    # nearest-resize gt masks to the proto resolution (reference
    # loss_tal.py:223-224 F.interpolate(..., mode='nearest'))
    ph, pw = protos.shape[1:3]
    if gt_masks.shape[-2:] != (ph, pw):
        gt_masks = jax.image.resize(
            gt_masks, gt_masks.shape[:2] + (ph, pw), method="nearest"
        )
    img_h, _ = assign["img_hw"]
    # input pixels -> proto pixels
    stride0_eff = img_h / ph * 2.0  # segment_mask_loss scales by 2/stride0
    lm = segment_mask_loss(
        mc, protos,
        assign["fg_mask"], assign["target_gt_idx"], gt_masks,
        assign["target_bboxes_px"], float(stride0_eff),
    ) * mask_gain
    items = jnp.stack(
        [det_items[0], jax.lax.stop_gradient(lm), det_items[1], det_items[2]]
    )
    return det_total + lm * B, items


def sigmoid_focal_loss(
    logits: jax.Array, targets: jax.Array,
    alpha: float = 0.25, gamma: float = 2.0,
) -> jax.Array:
    """Element-wise sigmoid focal loss (torchvision.ops.sigmoid_focal_loss —
    the reference's semantic term, utils/panoptic/loss_tal.py:262)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def semantic_loss(
    sem_logits: jax.Array,  # [B, Hs, Ws, C] from UConv (channel-last)
    sem_gt: jax.Array,  # [B, hs, ws] int class-id map, <0 = background
) -> Tuple[jax.Array, jax.Array]:
    """Semantic-segmentation terms of the panoptic loss (reference
    utils/panoptic/loss_tal.py:252-272): sigmoid focal (alpha .25, gamma 2,
    mean) and a global dice on the channel softmax.  The reference's
    ``semasks`` are per-class binary maps OR-ed from polygons
    (utils/panoptic/dataloaders.py:292-297); here the GT travels as a
    compact int class-id map and is one-hotted in-graph — out-of-range ids
    (background/void, -1) one-hot to all-zeros, matching pixels no polygon
    covers in the reference.  Returns (focal_term, dice_term), already
    scaled by the reference gains (x20 /2 x2.5 and /2 x2.5)."""
    c = sem_logits.shape[-1]
    if sem_gt.shape[1:3] != sem_logits.shape[1:3]:
        sem_gt = jax.image.resize(
            sem_gt, (sem_gt.shape[0],) + sem_logits.shape[1:3],
            method="nearest",
        )
    gt = jax.nn.one_hot(sem_gt, c, dtype=sem_logits.dtype)  # [B,Hs,Ws,C]
    focal = sigmoid_focal_loss(sem_logits, gt).mean() / 2.0
    p = jax.nn.softmax(sem_logits, axis=-1)
    inter = jnp.sum(p * gt)
    union = jnp.sum(p + gt)
    dice = (2.0 * inter + 1.0) / (union + 1.0)
    return focal * 20.0 * 2.5, (1.0 - dice) / 2.0 * 2.5


def compute_loss_panoptic(
    out,  # training output: (feats, mc, protos, sem)
    targets,  # [B, M, 5]
    t_mask,  # [B, M]
    gt_masks,  # [B, M, ph, pw] binary instance masks at proto resolution
    sem_gt,  # [B, hs, ws] int class-id map (things [0,nc); stuff ids above)
    strides,
    nc: int,
    mask_gain: float = 2.5,
):
    """Full panoptic loss (reference utils/panoptic/loss_tal.py:183-280):
    the Segment composite (box 7.5, mask 2.5/bs, cls 0.5, dfl 1.5) plus the
    semantic focal + dice terms over the UConv branch.  Returns
    (total*bs, (box, mask, cls, dfl, sem_focal, sem_dice))."""
    det_total, det_items = compute_loss_segment(
        out, targets, t_mask, gt_masks, strides, nc, mask_gain=mask_gain
    )
    B = out[0][0].shape[0]
    lf, ld = semantic_loss(out[3].astype(jnp.float32), sem_gt)
    items = jnp.concatenate(
        [det_items,
         jnp.stack([jax.lax.stop_gradient(lf), jax.lax.stop_gradient(ld)])]
    )
    return det_total + (lf + ld) * B, items
