"""RT-DETR training ops: Hungarian matching + contrastive denoising.

Equivalents of reference utils/ops.py (``HungarianMatcher``:11,
``get_cdn_group``:149) used by the RTDETRDetectionModel wrapper
(reference models/yolo.py:556-665).

The assignment itself runs through scipy's Jonker-Volgenant solver via
``jax.pure_callback`` — the cost matrix is tiny (queries x padded-gt), so a
host round-trip is cheaper than an on-device auction iteration, and the
padded static shapes keep the jit graph fixed.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou, xywh2xyxy

BIG = 1e6


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Host solver: returns col index assigned to each row (-1 = none)."""
    from scipy.optimize import linear_sum_assignment

    out = np.full(cost.shape[0], -1, np.int32)
    r, c = linear_sum_assignment(cost)
    out[r] = c
    return out


def hungarian_match(
    pred_scores: jax.Array,  # [Q, nc] (post-sigmoid)
    pred_bboxes: jax.Array,  # [Q, 4] xywh normalized
    gt_labels: jax.Array,  # [M] int
    gt_bboxes: jax.Array,  # [M, 4] xywh normalized
    gt_mask: jax.Array,  # [M] bool
    cost_gain: Optional[Dict[str, float]] = None,
    use_fl: bool = True,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """Single-image Hungarian matching (reference HungarianMatcher.forward).

    Returns (row_to_gt [Q] int32, matched [Q] bool): the gt index assigned to
    each query (or -1).  Invalid gts get +BIG cost so they are never chosen.
    """
    g = {"class": 1.0, "bbox": 5.0, "giou": 2.0, **(cost_gain or {})}
    scores = pred_scores[:, jnp.clip(gt_labels.astype(jnp.int32), 0, None)]  # [Q, M]
    if use_fl:
        neg = (1 - alpha) * scores**gamma * (-jnp.log1p(-scores + 1e-8))
        pos = alpha * (1 - scores) ** gamma * (-jnp.log(scores + 1e-8))
        cost_class = pos - neg
    else:
        cost_class = -scores

    l1 = jnp.abs(pred_bboxes[:, None] - gt_bboxes[None]).sum(-1)  # [Q, M]
    giou = bbox_iou(
        xywh2xyxy(pred_bboxes)[:, None],
        xywh2xyxy(gt_bboxes)[None],
        xywh=False,
        GIoU=True,
    )
    cost = g["class"] * cost_class + g["bbox"] * l1 + g["giou"] * (1.0 - giou)
    cost = jnp.where(gt_mask[None], cost, BIG)
    cost = jnp.nan_to_num(cost, nan=BIG, posinf=BIG, neginf=-BIG)

    row_to_gt = jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((pred_scores.shape[0],), jnp.int32),
        cost,
        vmap_method="sequential",
    )
    matched = (row_to_gt >= 0) & jnp.take(
        gt_mask, jnp.clip(row_to_gt, 0, gt_mask.shape[0] - 1)
    )
    # BIG-cost (padded) assignments are not real matches
    chosen_cost = jnp.take_along_axis(
        cost, jnp.clip(row_to_gt, 0, cost.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    matched = matched & (chosen_cost < BIG / 2)
    return row_to_gt, matched


def get_cdn_group(
    gt_labels: jax.Array,  # [B, M]
    gt_bboxes: jax.Array,  # [B, M, 4] xywh normalized
    gt_mask: jax.Array,  # [B, M]
    num_classes: int,
    num_queries: int,
    key: jax.Array,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Contrastive denoising groups (reference utils/ops.py:149): duplicate
    gts into positive/negative pairs with label flips and box jitter.

    Static-shape variant: emits exactly ``2 * group_size`` denoising queries
    per image where group_size = M (padded), with a validity mask.

    Returns (dn_labels [B, 2M], dn_bboxes [B, 2M, 4], dn_mask [B, 2M]).
    """
    B, M = gt_labels.shape
    k_cls, k_flip, k_box_p, k_box_n, k_sign = jax.random.split(key, 5)

    # class noise: flip ~ratio/2 of labels to random classes
    flip = jax.random.uniform(k_cls, (B, M)) < (cls_noise_ratio * 0.5)
    rand_cls = jax.random.randint(k_flip, (B, M), 0, num_classes)
    noisy_labels = jnp.where(flip, rand_cls, gt_labels.astype(jnp.int32))

    wh = gt_bboxes[..., 2:4]
    diff = jnp.concatenate([wh, wh], -1) * 0.5 * box_noise_scale

    def jitter(k, negative):
        signs = jax.random.randint(k_sign, (B, M, 4), 0, 2) * 2 - 1
        u = jax.random.uniform(k, (B, M, 4))
        u = u + 1.0 if negative else u  # negatives pushed outside the box
        delta = u * signs * diff
        xyxy = xywh2xyxy(gt_bboxes) + delta
        xyxy = jnp.clip(xyxy, 0.0, 1.0)
        xy = (xyxy[..., :2] + xyxy[..., 2:]) / 2
        wh_ = xyxy[..., 2:] - xyxy[..., :2]
        return jnp.concatenate([xy, wh_], -1)

    pos_boxes = jitter(k_box_p, negative=False)
    neg_boxes = jitter(k_box_n, negative=True)

    dn_labels = jnp.concatenate(
        [noisy_labels, jnp.full_like(noisy_labels, num_classes)], axis=1
    )
    dn_bboxes = jnp.concatenate([pos_boxes, neg_boxes], axis=1)
    dn_mask = jnp.concatenate([gt_mask, gt_mask], axis=1)
    return dn_labels, dn_bboxes, dn_mask


def rtdetr_loss(
    pred_scores: jax.Array,  # [B, Q, nc] logits
    pred_bboxes: jax.Array,  # [B, Q, 4] xywh normalized
    gt_labels: jax.Array,  # [B, M]
    gt_bboxes: jax.Array,  # [B, M, 4] xywh normalized
    gt_mask: jax.Array,  # [B, M]
    nc: int,
    gains: Dict[str, float] = None,
):
    """Set-prediction loss: Hungarian assignment + VFL-style cls + L1 + GIoU
    (reference RTDETRDetectionModel.loss via ultralytics RTDETRDetectionLoss
    — an external dep in the reference; first-party here)."""
    g = {"class": 1.0, "bbox": 5.0, "giou": 2.0, **(gains or {})}
    scores = jax.nn.sigmoid(pred_scores)

    # the assignment is a non-differentiable routing decision (DETR detaches
    # it); stop-gradient keeps the host callback off the tangent path
    row_to_gt, matched = jax.vmap(
        lambda s, b, l, gb, m: hungarian_match(s, b, l, gb, m)
    )(
        jax.lax.stop_gradient(scores),
        jax.lax.stop_gradient(pred_bboxes),
        gt_labels,
        gt_bboxes,
        gt_mask,
    )

    idx = jnp.clip(row_to_gt, 0, gt_labels.shape[1] - 1)
    tgt_labels = jnp.take_along_axis(gt_labels.astype(jnp.int32), idx, 1)
    tgt_boxes = jnp.take_along_axis(gt_bboxes, idx[..., None], 1)

    one_hot = jax.nn.one_hot(tgt_labels, nc) * matched[..., None]
    # focal classification over all queries
    p = scores
    ce = -(one_hot * jnp.log(p + 1e-8) + (1 - one_hot) * jnp.log1p(-p + 1e-8))
    w = one_hot * 0.75 + (1 - one_hot) * 0.25
    mod = jnp.abs(one_hot - p) ** 2.0
    n_match = jnp.maximum(matched.sum(), 1)
    loss_cls = (ce * w * mod).sum() / n_match

    l1 = jnp.abs(pred_bboxes - tgt_boxes).sum(-1)
    giou = bbox_iou(
        xywh2xyxy(pred_bboxes), xywh2xyxy(tgt_boxes), xywh=False, GIoU=True
    )
    loss_bbox = jnp.where(matched, l1, 0.0).sum() / n_match
    loss_giou = jnp.where(matched, 1.0 - giou, 0.0).sum() / n_match

    total = g["class"] * loss_cls + g["bbox"] * loss_bbox + g["giou"] * loss_giou
    items = jax.lax.stop_gradient(jnp.stack([loss_cls, loss_bbox, loss_giou]))
    return total, items
