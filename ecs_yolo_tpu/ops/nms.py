"""Fixed-shape, on-device non-maximum suppression.

The reference calls torchvision.ops.nms per image with dynamic candidate
counts (utils/general.py:649-741).  On TPU everything under jit must be
static-shape, so this implementation:

1. scores candidates (obj*cls for v1 heads, plain cls for DFL heads),
2. takes a static top-`max_nms` pool per image,
3. runs EXACT greedy NMS as a `lax.scan` of `max_det` pick-and-suppress steps
   (identical keep-set to torchvision's greedy algorithm capped at max_det),
4. returns padded `[B, max_det, 6]` (xyxy, conf, cls) plus a validity mask.

Class separation uses the same "offset boxes by class*max_wh" trick
(utils/general.py:726).  Soft-NMS / cluster-NMS variants from
utils/function.py live in `nms_variants.py`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy

MAX_WH = 4096.0
NEG_INF = -1e9


def _greedy_nms(boxes, scores, iou_thres: float, max_det: int):
    """Exact greedy NMS over a fixed candidate pool.

    boxes: [M, 4] (already class-offset), scores: [M] (NEG_INF = invalid).
    Returns (indices [max_det], keep_scores [max_det]).
    """
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def step(live_scores, _):
        i = jnp.argmax(live_scores)
        s = live_scores[i]
        b = boxes[i]
        inter = jnp.clip(
            jnp.minimum(boxes[:, 2], b[2]) - jnp.maximum(boxes[:, 0], b[0]), 0
        ) * jnp.clip(
            jnp.minimum(boxes[:, 3], b[3]) - jnp.maximum(boxes[:, 1], b[1]), 0
        )
        iou = inter / (area + area[i] - inter + 1e-7)
        # kill the picked index explicitly: a zero-area candidate has IoU 0
        # with itself and would otherwise be re-picked every step
        live_scores = live_scores.at[i].set(NEG_INF)
        suppress = iou > iou_thres
        live_scores = jnp.where(suppress, NEG_INF, live_scores)
        return live_scores, (i, s)

    _, (idx, kept) = jax.lax.scan(step, scores, None, length=max_det)
    return idx, kept


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "multi_label",
        "agnostic",
        "max_det",
        "max_nms",
        "has_obj",
        "merge",
        "redundant",
    ),
)
def non_max_suppression(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    multi_label: bool = False,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    has_obj: bool = True,
    merge: bool = False,
    redundant: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fixed-shape NMS.

    Args:
      prediction: v1 layout ``[B, A, 5+nc]`` (xywh, obj, cls...) when
        ``has_obj``; DFL layout ``[B, 4+nc, A]`` (xywh pixels, cls...) when
        not (that path transposes internally).
      merge: merge-NMS (reference utils/general.py:727-732) — each kept box
        becomes the score-weighted mean of overlapping same-class
        candidates; with ``redundant`` a kept box needs >= 1 supporting
        overlap or it is dropped.

    Returns:
      out: [B, max_det, 6] — x1, y1, x2, y2, conf, cls (padded with zeros)
      valid: [B, max_det] bool mask.
    """
    if not has_obj:
        prediction = jnp.transpose(prediction, (0, 2, 1))  # [B, A, 4+nc]
        boxes_xywh = prediction[..., :4]
        cls_scores = prediction[..., 4:]
    else:
        boxes_xywh = prediction[..., :4]
        cls_scores = prediction[..., 5:] * prediction[..., 4:5]  # obj * cls

    nc = cls_scores.shape[-1]
    boxes_xyxy = xywh2xyxy(boxes_xywh)
    use_multi = multi_label and nc > 1

    def single(boxes, scores):
        # boxes [A,4], scores [A,nc]
        if use_multi:
            flat = scores.reshape(-1)  # A*nc
            k = min(max_nms, flat.shape[0])
            top, flat_idx = jax.lax.top_k(flat, k)
            a_idx = flat_idx // nc
            c_idx = (flat_idx % nc).astype(jnp.float32)
            cand_boxes = boxes[a_idx]
        else:
            best = jnp.max(scores, axis=-1)
            cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
            k = min(max_nms, best.shape[0])
            top, a_idx = jax.lax.top_k(best, k)
            c_idx = cls[a_idx]
            cand_boxes = boxes[a_idx]

        valid = top > conf_thres
        live = jnp.where(valid, top, NEG_INF)
        offset = 0.0 if agnostic else MAX_WH
        off_boxes = cand_boxes + (c_idx * offset)[:, None]
        keep_idx, keep_scores = _greedy_nms(off_boxes, live, iou_thres, max_det)
        ok = keep_scores > conf_thres
        kept_boxes = cand_boxes[keep_idx]
        if merge:
            # weighted-mean merge over the class-offset candidate pool
            # (reference utils/general.py:727-732): weights = IoU-overlap
            # mask x candidate score
            kept_off = off_boxes[keep_idx]
            area_c = jnp.clip(off_boxes[:, 2] - off_boxes[:, 0], 0) * jnp.clip(
                off_boxes[:, 3] - off_boxes[:, 1], 0
            )
            area_k = jnp.clip(kept_off[:, 2] - kept_off[:, 0], 0) * jnp.clip(
                kept_off[:, 3] - kept_off[:, 1], 0
            )
            inter = jnp.clip(
                jnp.minimum(kept_off[:, None, 2], off_boxes[None, :, 2])
                - jnp.maximum(kept_off[:, None, 0], off_boxes[None, :, 0]), 0
            ) * jnp.clip(
                jnp.minimum(kept_off[:, None, 3], off_boxes[None, :, 3])
                - jnp.maximum(kept_off[:, None, 1], off_boxes[None, :, 1]), 0
            )
            iou = inter / (area_k[:, None] + area_c[None] - inter + 1e-7)
            # only conf-passing candidates participate (the reference's x
            # pool is already conf-filtered)
            overlap = (iou > iou_thres) & valid[None]  # [max_det, M]
            w = overlap * jnp.clip(top, 0.0)[None]
            merged = (w @ cand_boxes) / jnp.maximum(
                w.sum(-1, keepdims=True), 1e-9
            )
            kept_boxes = jnp.where(ok[:, None], merged, kept_boxes)
            if redundant:
                ok = ok & (overlap.sum(-1) > 1)
        out = jnp.concatenate(
            [
                kept_boxes,
                jnp.where(ok, keep_scores, 0.0)[:, None],
                c_idx[keep_idx][:, None],
            ],
            axis=-1,
        )
        out = jnp.where(ok[:, None], out, 0.0)
        return out, ok

    return jax.vmap(single)(boxes_xyxy, cls_scores)


def v10_postprocess(prediction: jax.Array, max_det: int = 300):
    """NMS-free top-k selection for v10Detect export
    (reference utils/general2.py:1140-1155): flatten (anchor, class) scores,
    take global top-k.  prediction: [B, 4+nc, A] decoded xywh + cls.
    Returns [B, max_det, 6] xyxy/conf/cls and validity mask."""
    pred = jnp.transpose(prediction, (0, 2, 1))
    boxes = xywh2xyxy(pred[..., :4])
    scores = pred[..., 4:]
    b, a, nc = scores.shape

    def single(bx, sc):
        flat = sc.reshape(-1)
        top, flat_idx = jax.lax.top_k(flat, max_det)
        a_idx = flat_idx // nc
        c_idx = (flat_idx % nc).astype(jnp.float32)
        out = jnp.concatenate(
            [bx[a_idx], top[:, None], c_idx[:, None]], axis=-1
        )
        return out, top > 0

    return jax.vmap(single)(boxes, scores)
