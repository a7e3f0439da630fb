"""Box format conversions and IoU family.

JAX equivalents of reference utils/general.py (xywh2xyxy, scale_coords) and
utils/metrics.py:227-326 (the GIoU/DIoU/CIoU/SIoU/EIoU IoU mega-switch).
Variant selection is static (Python bools), so each variant jit-compiles to
its own fused kernel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(x):
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half, x[..., 4:]], axis=-1)


def xyxy2xywh(x):
    x1y1, x2y2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate(
        [(x1y1 + x2y2) / 2, x2y2 - x1y1, x[..., 4:]], axis=-1
    )


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized xywh -> pixel xyxy (reference utils/general.py)."""
    scale = jnp.asarray([w, h, w, h], dtype=jnp.float32)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=jnp.float32)
    return xywh2xyxy(x[..., :4]) * scale + pad


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU matrix [N, M] for xyxy boxes [N,4] x [M,4]."""
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)  # [N,1,2]
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)  # [1,M,2]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0).prod(-1)
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_iou(
    box1,
    box2,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    SIoU: bool = False,
    EIoU: bool = False,
    Focal: bool = False,
    alpha: float = 1.0,
    gamma: float = 0.5,
    ciou_pow: bool = False,
    eps: float = 1e-7,
):
    """Elementwise IoU (broadcasting) with the reference's variant switch.

    Boxes are ``[..., 4]``; with ``xywh=True`` they are (cx, cy, w, h).
    ``Focal=True`` additionally returns the focal weight
    ``(inter/union)**gamma`` as a second output — the reference's
    Focal_{G,D,C,E,S}IoU variants (utils/metrics.py:263-320).  ``alpha``
    is the alpha-IoU exponent (utils/metrics.py:259-323; alpha=3 is the
    alpha-IoU paper setting, alpha=1 the reference default) applied to the
    penalty terms exactly where the reference applies it per variant.
    ``ciou_pow`` selects between the reference's two CIoU penalties:
    classic ``v*a`` (utils/metrics2.py:285-289, the TAL path — default)
    and the shadowed-pow variant of utils/metrics.py:270-275 (see NOTE at
    the CIoU branch).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, axis=-1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0
    )
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    def _ret(val):
        val = val.squeeze(-1)
        if Focal:
            return val, ((inter / union) ** gamma).squeeze(-1)
        return val

    if not (GIoU or DIoU or CIoU or SIoU or EIoU):
        return _ret(iou)

    def _pow(x):
        # the alpha-IoU exponent; alpha == 1 keeps each variant literally
        # identical to the pre-alpha expressions (and their gradients)
        return x if alpha == 1 else x**alpha

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if GIoU:
        c_area = cw * ch + eps
        return _ret(iou - _pow((c_area - union) / c_area + eps))

    c2 = _pow(cw**2 + ch**2) + eps
    rho2 = _pow(
        ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    )
    if DIoU:
        return _ret(iou - rho2 / c2)
    if CIoU:
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        a_ciou = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        if ciou_pow:
            # NOTE reference quirk (utils/metrics.py:270-275): the inner
            # ``alpha = v / (v - iou + 1 + eps)`` SHADOWS the alpha-IoU
            # parameter, so the aspect penalty is pow(v*a + eps, a) with
            # the TENSOR exponent — not the classic v*a — even at alpha=1.
            # Reproduced behind this flag (tests/test_ref_parity.py
            # TestAlphaIoU); the default is the classic penalty, which is
            # what the TAL path's utils/metrics2.py:285-289 computes.
            return _ret(iou - (rho2 / c2 + (v * a_ciou + eps) ** a_ciou))
        return _ret(iou - (rho2 / c2 + v * a_ciou))
    if EIoU:
        rho_w2 = (w2 - w1) ** 2
        rho_h2 = ((b2_y2 - b2_y1) - (b1_y2 - b1_y1)) ** 2
        return _ret(iou - (rho2 / c2 + rho_w2 / _pow(cw**2 + eps) + rho_h2 / _pow(ch**2 + eps)))
    # SIoU (https://arxiv.org/pdf/2205.12740) — reference utils/metrics.py:291
    s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5 + eps
    s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5 + eps
    sigma = jnp.sqrt(s_cw**2 + s_ch**2)
    sin_a1 = jnp.abs(s_cw) / sigma
    sin_a2 = jnp.abs(s_ch) / sigma
    threshold = math.sqrt(2) / 2
    sin_a = jnp.where(sin_a1 > threshold, sin_a2, sin_a1)
    angle_cost = jnp.cos(jnp.arcsin(jnp.clip(sin_a, -1, 1)) * 2 - math.pi / 2)
    rho_x = (s_cw / cw) ** 2
    rho_y = (s_ch / ch) ** 2
    gamma = angle_cost - 2
    distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
    omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
    omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
    shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
    return _ret(iou - _pow(0.5 * (distance_cost + shape_cost) + eps))


def wiou(box1, box2, xywh: bool = True, eps: float = 1e-7):
    """WIoU v1 (reference utils/metrics.py:313-318): returns (iou, penalty)
    where penalty = exp(rho2 / c2) weights the loss of outlier boxes."""
    iou_v = bbox_iou(box1, box2, xywh=xywh, eps=eps)
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        (b2[..., 0] + b2[..., 2] - b1[..., 0] - b1[..., 2]) ** 2
        + (b2[..., 1] + b2[..., 3] - b1[..., 1] - b1[..., 3]) ** 2
    ) / 4
    return iou_v, jnp.exp(rho2 / c2)


def clip_coords(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape
    return jnp.concatenate(
        [
            jnp.clip(boxes[..., 0:1], 0, w),
            jnp.clip(boxes[..., 1:2], 0, h),
            jnp.clip(boxes[..., 2:3], 0, w),
            jnp.clip(boxes[..., 3:4], 0, h),
        ],
        axis=-1,
    )


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Map letterboxed-image xyxy coords back to the native image
    (reference utils/general.py:621-647)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    coords = coords - jnp.asarray([pad[0], pad[1], pad[0], pad[1]])
    coords = coords / gain
    return clip_coords(coords, img0_shape)
