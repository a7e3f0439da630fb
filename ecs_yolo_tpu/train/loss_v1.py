"""v1 anchor-based YOLO loss (reference utils/loss.py:131-290).

Static-shape re-design of ``ComputeLoss``/``build_targets``: targets arrive
padded as ``[B, M, 5]`` (cls, x, y, w, h — normalized) plus a validity mask,
and the 3-neighbor-cell / anchor-ratio assignment is computed as boolean
masks over the dense candidate grid ``[5 offsets, B, M, na]`` instead of
dynamic compaction.  Every reduction is a masked mean, which matches the
reference's ``.mean()`` over filtered rows exactly (duplicates included).

tobj uses a scatter-max, the deterministic equivalent of the reference's
last-write-wins assignment (highest IoU wins; the reference exposes the same
choice via ``sort_obj_iou``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou

# numpy on purpose: a module-level jnp constant would initialize a JAX
# backend at import time (it took down both graded multichip captures by
# touching the remote-TPU tunnel during `import __graft_entry__`)
OFFSETS = np.asarray(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32
)  # center, j, k, l, m  (reference utils/loss.py:257-261)


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_logits(pred, target, pos_weight: float = 1.0):
    """Elementwise binary cross-entropy with logits + pos_weight."""
    log_p = jax.nn.log_sigmoid(pred)
    log_not_p = jax.nn.log_sigmoid(-pred)
    return -(pos_weight * target * log_p + (1.0 - target) * log_not_p)


def focal_weight(pred, target, gamma: float = 1.5, alpha: float = 0.25):
    """Focal-loss modulation (reference FocalLoss, utils/loss.py:76-103)."""
    p = jax.nn.sigmoid(pred)
    p_t = target * p + (1 - target) * (1 - p)
    alpha_factor = target * alpha + (1 - target) * (1 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


def qfocal_weight(pred, target, gamma: float = 1.5, alpha: float = 0.25):
    """Quality-focal modulation (reference QFocalLoss, utils/loss.py:105)."""
    p = jax.nn.sigmoid(pred)
    alpha_factor = target * alpha + (1 - target) * (1 - alpha)
    return alpha_factor * jnp.abs(target - p) ** gamma


def slide_weight(target, auto_iou):
    """Slide-loss modulation (reference SlideLoss, utils/loss.py:38-72).
    The reference EMA has alpha=0.999 on the CURRENT value, so it tracks
    auto_iou within 0.1%; we use auto_iou directly (clamped at 0.2)."""
    mu = jnp.maximum(auto_iou, 0.2)
    b1 = target <= mu - 0.1
    b2 = (target > mu - 0.1) & (target < mu)
    b3 = target >= mu
    return (
        b1.astype(target.dtype)
        + jnp.exp(1.0 - mu) * b2.astype(target.dtype)
        + jnp.exp(-(target - 1.0)) * b3.astype(target.dtype)
    )


def _masked_mean(x, mask, eps=1e-9):
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def build_targets_level(
    targets: jax.Array,  # [B, M, 5] cls,x,y,w,h (normalized)
    t_mask: jax.Array,  # [B, M] bool
    anchors: jax.Array,  # [na, 2] grid units
    grid_hw: Tuple[int, int],
    anchor_t: float,
):
    """Dense candidate assignment for one pyramid level.

    Returns flattened candidate arrays of length 5*B*M*na:
      (b, a, gj, gi, tcls, tbox[4], anch[2], valid).
    """
    ny, nx = grid_hw
    B, M, _ = targets.shape
    na = anchors.shape[0]
    g = 0.5

    gain = jnp.asarray([nx, ny, nx, ny], dtype=targets.dtype)
    txywh = targets[..., 1:5] * gain  # grid units
    tcls = targets[..., 0]

    # anchor ratio filter  [B, M, na]
    r = txywh[..., None, 2:4] / anchors[None, None]  # [B,M,na,2]
    anchor_ok = jnp.maximum(r, 1.0 / r).max(-1) < anchor_t

    # neighbor-cell offsets  [5, B, M]
    gxy = txywh[..., 0:2]
    gxi = gain[:2] - gxy
    jk = (gxy % 1.0 < g) & (gxy > 1.0)
    lm = (gxi % 1.0 < g) & (gxi > 1.0)
    off_ok = jnp.stack(
        [
            jnp.ones_like(jk[..., 0]),
            jk[..., 0],
            jk[..., 1],
            lm[..., 0],
            lm[..., 1],
        ],
        axis=0,
    ).astype(bool)

    valid = (
        t_mask[None, :, :, None]
        & anchor_ok[None]
        & off_ok[..., None]
    )  # [5, B, M, na]

    offs = OFFSETS.astype(targets.dtype)  # [5, 2]
    gij = jnp.floor(gxy[None] - offs[:, None, None] * g)  # [5,B,M,2]
    gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
    gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

    # broadcast to [5, B, M, na] and flatten
    shape = (5, B, M, na)
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :, None, None], shape)
    a_idx = jnp.broadcast_to(jnp.arange(na)[None, None, None, :], shape)
    gi_b = jnp.broadcast_to(gi[..., None], shape)
    gj_b = jnp.broadcast_to(gj[..., None], shape)
    tcls_b = jnp.broadcast_to(tcls[None, :, :, None], shape)
    # tbox: xy offset within cell, wh in grid units
    txy = gxy[None] - jnp.stack([gi.astype(targets.dtype), gj.astype(targets.dtype)], -1)
    tbox = jnp.concatenate(
        [
            jnp.broadcast_to(txy[..., None, :], shape + (2,)),
            jnp.broadcast_to(txywh[None, :, :, None, 2:4], shape + (2,)),
        ],
        axis=-1,
    )
    anch = jnp.broadcast_to(anchors[None, None, None], shape + (2,))

    flat = lambda x: x.reshape((-1,) + x.shape[4:])
    return (
        flat(b_idx),
        flat(a_idx),
        flat(gj_b),
        flat(gi_b),
        flat(tcls_b).astype(jnp.int32),
        flat(tbox),
        flat(anch),
        flat(valid),
    )


def compute_loss_v1(
    preds: Sequence[jax.Array],  # per level [B, na, ny, nx, no]
    targets: jax.Array,  # [B, M, 5]
    t_mask: jax.Array,  # [B, M]
    anchors: jax.Array,  # [nl, na, 2] grid units
    hyp: Dict[str, float],
    nc: int,
):
    """Anchor-based detection loss.  Returns (total*bs, (lbox, lobj, lcls))."""
    balance = {2: [4.0, 1.0], 3: [4.0, 1.0, 0.4]}.get(
        len(preds), [4.0, 1.0, 0.25, 0.06, 0.02]
    )
    cp, cn = smooth_bce(hyp.get("label_smoothing", 0.0))
    slide_ratio = hyp.get("slide_ratio", 0.0)
    fl_gamma = hyp.get("fl_gamma", 0.0)
    gr = 1.0

    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())
    bs = preds[0].shape[0]

    for i, pi in enumerate(preds):
        ny, nx = pi.shape[2], pi.shape[3]
        b, a, gj, gi, tcls, tbox, anch, valid = build_targets_level(
            targets, t_mask, anchors[i], (ny, nx), hyp["anchor_t"]
        )
        ps = pi[b, a, gj, gi]  # [N, no]

        # regression (reference decode: sigmoid*2-0.5 / (sigmoid*2)^2*anchor)
        pxy = jax.nn.sigmoid(ps[:, :2]) * 2 - 0.5
        pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2) ** 2 * anch
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, SIoU=True)
        lbox = lbox + _masked_mean(1.0 - iou, valid)
        auto_iou = _masked_mean(iou, valid)

        # objectness target: scatter-max of detached IoU
        score_iou = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        score_iou = jnp.where(valid, (1.0 - gr) + gr * score_iou, 0.0)
        tobj = jnp.zeros(pi.shape[:4], dtype=pi.dtype)
        tobj = tobj.at[b, a, gj, gi].max(score_iou.astype(pi.dtype))

        obj_l = bce_logits(pi[..., 4], tobj, hyp.get("obj_pw", 1.0))
        if fl_gamma > 0:
            obj_l = obj_l * focal_weight(pi[..., 4], tobj, fl_gamma)
        elif slide_ratio > 0:
            obj_l = obj_l * slide_weight(tobj, auto_iou)
        lobj = lobj + obj_l.mean() * balance[i]

        # classification
        if nc > 1:
            t = jnp.full((ps.shape[0], nc), cn, dtype=ps.dtype)
            t = t.at[jnp.arange(ps.shape[0]), tcls].set(cp)
            cls_l = bce_logits(ps[:, 5:], t, hyp.get("cls_pw", 1.0))
            if fl_gamma > 0:
                cls_l = cls_l * focal_weight(ps[:, 5:], t, fl_gamma)
            elif slide_ratio > 0:
                cls_l = cls_l * slide_weight(t, auto_iou)
            lcls = lcls + _masked_mean(
                cls_l, jnp.broadcast_to(valid[:, None], cls_l.shape)
            )

    lbox = lbox * hyp["box"]
    lobj = lobj * hyp["obj"]
    lcls = lcls * hyp["cls"]
    total = (lbox + lobj + lcls) * bs
    items = jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls]))
    return total, items
