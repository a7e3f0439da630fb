"""TAL/DFL anchor-free loss (reference utils/loss_tal.py:106-342).

Static-shape version: targets arrive padded ``[B, M, 5]`` + mask; the
dynamic ``if fg_mask.sum()`` branch becomes masked sums (identical values).
Covers ComputeLoss (topk=10), ComputeLoss2 (parametric topk, used for v10's
one2one topk=1), v10DetectLoss (one2many + one2one), and the dual-branch
deep-supervision loss (reference utils/loss_tal_dual.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import make_anchors, dist2bbox, bbox2dist
from ..ops.boxes import bbox_iou, xywh2xyxy
from .loss_v1 import bce_logits
from .tal import task_aligned_assigner


def _df_loss(pred_dist, target, reg_max):
    """Distribution-focal cross-entropy between adjacent integer bins
    (reference loss_tal.py:94-104).  pred_dist [N,4,reg_max+1], target [N,4].
    """
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, reg_max)[..., None], axis=-1
    )[..., 0]
    return (ce_l * wl + ce_r * wr).mean(-1, keepdims=True)


def bbox_decode(anchor_points, pred_dist, reg_max):
    """DFL expectation decode (reference loss_tal.py:158-164)."""
    b, a, c = pred_dist.shape
    proj = jnp.arange(reg_max, dtype=pred_dist.dtype)
    p = pred_dist.reshape(b, a, 4, c // 4)
    p = jax.nn.softmax(p, axis=-1) @ proj
    return dist2bbox(p, anchor_points, xywh=False)


def compute_loss_tal(
    feats: Sequence[jax.Array],  # per level [B, no, h, w]
    targets: jax.Array,  # [B, M, 5] cls,x,y,w,h normalized
    t_mask: jax.Array,  # [B, M]
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    gains: Tuple[float, float, float] = (7.5, 0.5, 1.5),
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    cls_pw: float = 1.0,
    return_assign: bool = False,
):
    """Returns (total*bs, (box, cls, dfl)) — reference loss_tal.py:166-216.

    With ``return_assign`` additionally returns the TAL assignment pieces the
    segmentation mask loss needs (reference utils/segment/loss_tal.py:198):
    fg_mask, target_gt_idx, target_bboxes in input pixels, and the proto
    stride."""
    no = nc + reg_max * 4
    B = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(B, no, -1) for f in feats], axis=2)
    pred_distri = jnp.transpose(flat[:, : reg_max * 4], (0, 2, 1))  # [B,A,64]
    pred_scores = jnp.transpose(flat[:, reg_max * 4 :], (0, 2, 1))  # [B,A,nc]

    shapes = [(f.shape[2], f.shape[3]) for f in feats]
    anchor_points, stride_tensor = make_anchors(
        shapes, strides, 0.5, pred_scores.dtype
    )
    img_h = shapes[0][0] * strides[0]
    img_w = shapes[0][1] * strides[0]

    gt_labels = targets[..., 0]
    scale = jnp.asarray([img_w, img_h, img_w, img_h], dtype=targets.dtype)
    gt_bboxes = xywh2xyxy(targets[..., 1:5] * scale)  # pixels
    gt_bboxes = jnp.where(t_mask[..., None], gt_bboxes, 0.0)
    mask_gt = t_mask & (targets[..., 3] > 0)

    pred_bboxes = bbox_decode(anchor_points, pred_distri, reg_max)  # grid units

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_tensor,
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=topk,
        num_classes=nc,
        alpha=alpha,
        beta=beta,
    )
    target_bboxes = assign.target_bboxes / stride_tensor
    target_scores = assign.target_scores
    fg = assign.fg_mask
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # cls
    loss_cls = (
        bce_logits(pred_scores, target_scores.astype(pred_scores.dtype), cls_pw).sum()
        / target_scores_sum
    )

    # box + dfl (masked — reference BboxLoss, loss_tal.py:62-92)
    weight = target_scores.sum(-1)  # [B,A]
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, SIoU=True)
    loss_iou = jnp.where(fg, (1.0 - iou) * weight, 0.0).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points, target_bboxes, reg_max - 1)
    pd = pred_distri.reshape(B, -1, 4, reg_max)
    dfl = _df_loss(
        pd.reshape(-1, 4, reg_max), target_ltrb.reshape(-1, 4), reg_max - 1
    ).reshape(B, -1)
    loss_dfl = jnp.where(fg, dfl * weight, 0.0).sum() / target_scores_sum

    box_g, cls_g, dfl_g = gains
    loss = jnp.stack([loss_iou * box_g, loss_cls * cls_g, loss_dfl * dfl_g])
    if return_assign:
        assign_info = dict(
            fg_mask=fg,
            target_gt_idx=assign.target_gt_idx,
            target_bboxes_px=assign.target_bboxes,  # input pixels, xyxy
            target_scores_sum=target_scores_sum,
            img_hw=(img_h, img_w),
        )
        return loss.sum() * B, jax.lax.stop_gradient(loss), assign_info
    return loss.sum() * B, jax.lax.stop_gradient(loss)


def compute_loss_v10(
    out,  # V10Output of per-level feats
    targets,
    t_mask,
    strides,
    nc: int,
    reg_max: int = 16,
):
    """one2many(topk=10) + one2one(topk=1) sum (reference v10DetectLoss,
    loss_tal.py:330-342)."""
    many, items_m = compute_loss_tal(
        out.one2many, targets, t_mask, strides, nc, reg_max, topk=10
    )
    one, items_o = compute_loss_tal(
        out.one2one, targets, t_mask, strides, nc, reg_max, topk=1
    )
    return many + one, jnp.concatenate([items_m, items_o])


def compute_loss_dual(
    d1: Sequence[jax.Array],
    d2: Sequence[jax.Array],
    targets,
    t_mask,
    strides,
    nc: int,
    reg_max: int = 16,
    aux_cls_gain: float = 0.25,
):
    """Dual-branch deep supervision (reference utils/loss_tal_dual.py:106+):
    aux branch d1 with down-weighted cls gain + main branch d2."""
    aux, items_a = compute_loss_tal(
        d1, targets, t_mask, strides, nc, reg_max,
        gains=(7.5, 0.5 * aux_cls_gain, 1.5),
    )
    main, items_m = compute_loss_tal(
        d2, targets, t_mask, strides, nc, reg_max
    )
    return aux + main, jnp.concatenate([items_a, items_m])


def compute_loss_triple(
    ds,
    targets,
    t_mask,
    strides,
    nc: int,
    reg_max: int = 16,
    aux_cls_gain: float = 0.25,
):
    """Triple-branch deep supervision (TripleDetect/TripleDDetect heads,
    reference models/yolo_snn.py:284-448): two aux branches with
    down-weighted cls gain + the main (last) branch."""
    total = jnp.zeros(())
    items = []
    for k, d in enumerate(ds):
        gains = (7.5, 0.5 * (aux_cls_gain if k < len(ds) - 1 else 1.0), 1.5)
        li, it = compute_loss_tal(
            d, targets, t_mask, strides, nc, reg_max, gains=gains
        )
        total = total + li
        items.append(it)
    return total, jnp.concatenate(items)
