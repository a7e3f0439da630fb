"""Alternative NMS algorithms (reference utils/function.py:6-150 and
utils/general.py:855-1007): soft-NMS, cluster-NMS, cluster-DIoU-NMS, and the
SPM (score-penalty-mechanism) variants.

All operate on fixed-size candidate pools (padded, score -inf for invalid)
so they stay jit-compatible; cluster-NMS is especially TPU-friendly since it
is already a fixed-point iteration of matrix ops rather than a greedy loop.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import box_iou

NEG_INF = -1e9


def _iou_upper(boxes, eps=1e-7):
    """Upper-triangular IoU matrix (row i vs lower-scored j>i)."""
    iou = box_iou(boxes, boxes, eps)
    n = boxes.shape[0]
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    return jnp.where(triu, iou, 0.0)


def _diou_penalty(boxes):
    """Center-distance penalty used by DIoU-NMS."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    rho2 = (cx[None] - cx[:, None]) ** 2 + (cy[None] - cy[:, None]) ** 2
    x1 = jnp.minimum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.minimum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.maximum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.maximum(boxes[:, None, 3], boxes[None, :, 3])
    c2 = (x2 - x1) ** 2 + (y2 - y1) ** 2 + 1e-7
    return rho2 / c2


def soft_nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_thres: float = 0.3,
    sigma: float = 0.5,
    score_thres: float = 0.25,
    max_det: int = 300,
):
    """Gaussian soft-NMS (reference soft_nms_pytorch, utils/general.py:855).

    Sequentially picks the top box and decays overlapping scores by
    exp(-iou^2 / sigma).  Returns (keep_idx [max_det], keep_scores).
    """
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def step(live, _):
        i = jnp.argmax(live)
        s = live[i]
        b = boxes[i]
        inter = jnp.clip(
            jnp.minimum(boxes[:, 2], b[2]) - jnp.maximum(boxes[:, 0], b[0]), 0
        ) * jnp.clip(
            jnp.minimum(boxes[:, 3], b[3]) - jnp.maximum(boxes[:, 1], b[1]), 0
        )
        iou = inter / (area + area[i] - inter + 1e-7)
        decay = jnp.exp(-(iou**2) / sigma)
        live = live * decay
        live = live.at[i].set(NEG_INF)
        return live, (i, s)

    _, (idx, kept) = jax.lax.scan(step, scores, None, length=max_det)
    ok = kept > score_thres
    return idx, jnp.where(ok, kept, 0.0)


def cluster_nms(
    boxes: jax.Array, scores: jax.Array, iou_thres: float = 0.5,
    iterations: int = 200,
):
    """Cluster-NMS (reference cluster_nms, utils/general.py:917): iterate
    B = triu_iou * diag(keep) until fixed point; keep_i = max_j B_ij <= thr.
    Converges to exactly the greedy keep-set."""
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    iou = _iou_upper(boxes_s)

    def body(carry):
        prev, keep, it = carry
        masked = iou * keep[:, None]
        new_keep = (masked.max(0) <= iou_thres)
        return masked, new_keep, it + 1

    def cond(carry):
        prev, keep, it = carry
        masked = iou * keep[:, None]
        return jnp.logical_and(
            it < iterations, jnp.any((masked.max(0) <= iou_thres) != keep)
        )

    keep0 = jnp.ones(boxes.shape[0], bool)
    _, keep, _ = jax.lax.while_loop(cond, body, (iou, keep0, 0))
    keep = keep & (scores[order] > 0)
    return order, keep


def cluster_diou_nms(
    boxes: jax.Array, scores: jax.Array, iou_thres: float = 0.5,
    iterations: int = 200,
):
    """Cluster-NMS with DIoU criterion (reference cluster_diounms,
    utils/general.py:935)."""
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    n = boxes_s.shape[0]
    iou = _iou_upper(boxes_s) - jnp.where(
        jnp.triu(jnp.ones((n, n), bool), k=1), _diou_penalty(boxes_s), 0.0
    )

    def body(carry):
        keep, it = carry
        masked = iou * keep[:, None]
        return (masked.max(0) <= iou_thres), it + 1

    def cond(carry):
        keep, it = carry
        masked = iou * keep[:, None]
        return jnp.logical_and(
            it < iterations, jnp.any((masked.max(0) <= iou_thres) != keep)
        )

    keep0 = jnp.ones(n, bool)
    keep, _ = jax.lax.while_loop(cond, body, (keep0, 0))
    keep = keep & (scores[order] > 0)
    return order, keep


def cluster_spm_nms(
    boxes: jax.Array, scores: jax.Array, iou_thres: float = 0.5,
    iterations: int = 3, score_thres: float = 0.25,
):
    """Cluster-SPM: multiply scores by prod(1 - iou) penalties
    (reference cluster_SPM_nms, utils/general.py:964)."""
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = _iou_upper(boxes_s)

    b = iou
    for _ in range(iterations):
        keep = (b.max(0) <= iou_thres).astype(boxes.dtype)
        b = iou * keep[:, None]
    penalty = jnp.prod(1.0 - b, axis=0)
    new_scores = scores_s * penalty
    return order, new_scores > score_thres


def cluster_spm_dist_nms(
    boxes: jax.Array, scores: jax.Array, iou_thres: float = 0.5,
    iterations: int = 3, score_thres: float = 0.25,
):
    """Cluster-SPM with distance penalty (reference cluster_SPM_dist,
    utils/general.py:984)."""
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    n = boxes_s.shape[0]
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    iou = _iou_upper(boxes_s)
    d = jnp.where(triu, _diou_penalty(boxes_s), 0.0)

    b = iou
    for _ in range(iterations):
        keep = (b.max(0) <= iou_thres).astype(boxes.dtype)
        b = iou * keep[:, None]
    penalty = jnp.prod(jnp.minimum(1.0 - b + d, 1.0), axis=0)
    new_scores = scores_s * penalty
    return order, new_scores > score_thres
