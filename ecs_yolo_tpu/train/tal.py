"""Task-Aligned assigner (reference utils/tal/assigner.py:51-179).

Fully vectorized, static-shape JAX port: gt boxes arrive padded to
``[B, M, ...]`` with a validity mask; every dynamic branch of the reference
(``n_max_boxes == 0``, ``fg_mask.max() > 1``) becomes an unconditional masked
computation with identical results.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jax.Array  # [B, A]
    target_bboxes: jax.Array  # [B, A, 4]
    target_scores: jax.Array  # [B, A, nc]
    fg_mask: jax.Array  # [B, A] bool
    target_gt_idx: jax.Array  # [B, A] assigned gt row per anchor


def select_candidates_in_gts(xy_centers, gt_bboxes, eps=1e-9):
    """[A,2] x [B,M,4] -> [B,M,A] bool: anchor center strictly inside gt."""
    lt = gt_bboxes[..., None, :2]  # [B,M,1,2]
    rb = gt_bboxes[..., None, 2:]  # [B,M,1,2]
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1
    )  # [B,M,A,4]
    return deltas.min(-1) > eps


def select_highest_overlaps(mask_pos, overlaps, n_max_boxes):
    """Resolve anchors assigned to multiple gts: highest IoU wins
    (reference assigner.py:25-49)."""
    fg_mask = mask_pos.sum(-2)  # [B, A]
    mask_multi = (fg_mask[:, None, :] > 1)  # [B, 1, A] broadcast over M
    max_idx = jnp.argmax(overlaps, axis=-2)  # [B, A]
    is_max = jax.nn.one_hot(max_idx, n_max_boxes, dtype=mask_pos.dtype)
    is_max = jnp.transpose(is_max, (0, 2, 1))  # [B, M, A]
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # [B, A]
    return target_gt_idx, fg_mask, mask_pos


def select_topk_candidates(metrics, topk, topk_mask, eps=1e-9):
    """Top-k mask per gt (reference assigner.py:137-159): one-hot-sum with
    the >1 de-duplication trick for masked entries."""
    num_anchors = metrics.shape[-1]
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, topk)  # [B,M,topk]
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    one_hot = jax.nn.one_hot(topk_idxs, num_anchors, dtype=jnp.int32)
    is_in_topk = one_hot.sum(-2)  # [B,M,A]
    return jnp.where(is_in_topk > 1, 0, is_in_topk).astype(metrics.dtype)


def task_aligned_assigner(
    pd_scores: jax.Array,  # [B, A, nc] (post-sigmoid)
    pd_bboxes: jax.Array,  # [B, A, 4] xyxy (image units)
    anc_points: jax.Array,  # [A, 2] (image units)
    gt_labels: jax.Array,  # [B, M] int
    gt_bboxes: jax.Array,  # [B, M, 4] xyxy (image units)
    mask_gt: jax.Array,  # [B, M] bool
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    B, M = gt_labels.shape
    A = pd_scores.shape[1]

    # align metric  (assigner.py:124-135)
    gt_l = jnp.clip(gt_labels.astype(jnp.int32), 0, num_classes - 1)
    bbox_scores = jnp.take_along_axis(
        pd_scores, gt_l[:, None, :], axis=-1
    )  # [B, A, M]
    bbox_scores = jnp.transpose(bbox_scores, (0, 2, 1))  # [B, M, A]
    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )  # [B, M, A]
    overlaps = jnp.clip(overlaps, 0.0)
    align_metric = bbox_scores**alpha * overlaps**beta

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes, eps)
    topk_mask = jnp.broadcast_to(mask_gt[..., None], (B, M, topk))
    mask_topk = select_topk_candidates(
        align_metric * mask_in_gts, topk, topk_mask, eps
    )
    mask_pos = mask_topk * mask_in_gts * mask_gt[..., None]

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
        mask_pos, overlaps, M
    )

    # gather targets  (assigner.py:161-179)
    target_labels = jnp.take_along_axis(gt_l, target_gt_idx, axis=1)  # [B,A]
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # [B,A,4]
    target_scores = jax.nn.one_hot(target_labels, num_classes)
    target_scores = jnp.where(fg_mask[..., None] > 0, target_scores, 0.0)

    # normalize  (assigner.py:96-102)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)  # [B,M,1]
    pos_overlaps = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)).max(-2)[..., None]
    target_scores = target_scores * norm

    return AssignResult(
        target_labels, target_bboxes, target_scores, fg_mask > 0,
        target_gt_idx,
    )
