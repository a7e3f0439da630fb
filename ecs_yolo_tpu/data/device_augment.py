"""Device-side (jit-compiled) batch augmentation.

The reference does all augmentation in DataLoader worker processes on CPU
(utils/datasets.py:553-624).  On TPU the host can become the bottleneck, so
this module provides jit-able batch equivalents — HSV jitter, horizontal
flip, affine warp (rotation/scale/translate/shear), and 4-way mosaic — that
run on the accelerator after a cheap host decode (SURVEY §2.9 north star).

All ops take/return [B, H, W, 3] float images in [0, 1] plus padded label
tensors [B, M, 5] (cls, cx, cy, w, h normalized) and masks [B, M].
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


# --- color -------------------------------------------------------------------


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, -1)
    minc = jnp.min(rgb, -1)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / (maxc + 1e-12), 0.0)
    d_safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        maxc == r,
        ((g - b) / d_safe) % 6.0,
        jnp.where(maxc == g, (b - r) / d_safe + 2.0, (r - g) / d_safe + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    return jnp.stack([h, s, v], -1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h).astype(jnp.int32) % 6
    f = h - jnp.floor(h)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], -1)


def random_hsv(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """Per-image HSV jitter (device equivalent of augment_hsv)."""
    b = images.shape[0]
    r = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0) * jnp.asarray(
        [hgain, sgain, vgain]
    ) + 1.0
    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] * r[:, None, None, 0]) % 1.0
    s = jnp.clip(hsv[..., 1] * r[:, None, None, 1], 0, 1)
    v = jnp.clip(hsv[..., 2] * r[:, None, None, 2], 0, 1)
    return hsv_to_rgb(jnp.stack([h, s, v], -1))


# --- geometry ----------------------------------------------------------------


def _warp_one(img, minv):
    """Bilinear inverse warp of one [H, W, 3] image with a 3x3 matrix."""
    h, w = img.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs, ys, ones], 0).reshape(3, -1).astype(jnp.float32)
    src = minv @ coords
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    out = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [sy, sx], order=1, mode="constant", cval=114.0 / 255.0
        ),
        in_axes=-1, out_axes=-1,
    )(img)
    return out.reshape(h, w, 3)


def _affine_params(key, degrees, translate, scale, shear, w, h):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) * math.pi / 180
    s = jax.random.uniform(k2, (), minval=1 - scale, maxval=1 + scale)
    shx = jnp.tan(
        jax.random.uniform(k3, (), minval=-shear, maxval=shear) * math.pi / 180
    )
    shy = jnp.tan(
        jax.random.uniform(k4, (), minval=-shear, maxval=shear) * math.pi / 180
    )
    tx = jax.random.uniform(k5, (), minval=0.5 - translate, maxval=0.5 + translate) * w
    ty = jax.random.uniform(
        jax.random.fold_in(k5, 1), (), minval=0.5 - translate,
        maxval=0.5 + translate,
    ) * h
    ca, sa = s * jnp.cos(a), s * jnp.sin(a)
    # M = T @ Shear @ R @ Center  (same composition as the host path)
    C = jnp.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]], jnp.float32)
    R = jnp.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1]], jnp.float32)
    S = jnp.array([[1, shx, 0], [shy, 1, 0], [0, 0, 1]], jnp.float32)
    T = jnp.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], jnp.float32)
    return T @ S @ R @ C


@partial(jax.jit, static_argnames=("degrees", "translate", "scale", "shear"))
def random_affine(
    images, labels, masks, key,
    degrees: float = 0.0, translate: float = 0.1, scale: float = 0.5,
    shear: float = 0.0,
):
    """Batched random affine with label transformation + degenerate-box
    filtering (device equivalent of random_perspective)."""
    b, h, w = images.shape[:3]
    keys = jax.random.split(key, b)
    ms = jax.vmap(
        lambda k: _affine_params(k, degrees, translate, scale, shear, w, h)
    )(keys)
    minv = jnp.linalg.inv(ms)
    out = jax.vmap(_warp_one)(images, minv)

    # transform box corners
    scale_vec = jnp.asarray([w, h, w, h], jnp.float32)
    xyxy = jnp.concatenate(
        [
            labels[..., 1:3] - labels[..., 3:5] / 2,
            labels[..., 1:3] + labels[..., 3:5] / 2,
        ],
        -1,
    ) * scale_vec
    corners = jnp.stack(
        [
            xyxy[..., 0], xyxy[..., 1],
            xyxy[..., 2], xyxy[..., 1],
            xyxy[..., 2], xyxy[..., 3],
            xyxy[..., 0], xyxy[..., 3],
        ],
        -1,
    ).reshape(b, -1, 4, 2)
    ones = jnp.ones(corners.shape[:-1] + (1,), jnp.float32)
    pts = jnp.concatenate([corners, ones], -1)  # [B, M, 4, 3]
    warped = jnp.einsum("bij,bmkj->bmki", ms, pts)
    wx = warped[..., 0] / warped[..., 2]
    wy = warped[..., 1] / warped[..., 2]
    nx1 = jnp.clip(wx.min(-1), 0, w)
    ny1 = jnp.clip(wy.min(-1), 0, h)
    nx2 = jnp.clip(wx.max(-1), 0, w)
    ny2 = jnp.clip(wy.max(-1), 0, h)
    bw, bh = nx2 - nx1, ny2 - ny1
    ok = masks & (bw > 2) & (bh > 2) & (bw / (bh + 1e-9) < 20) & (
        bh / (bw + 1e-9) < 20
    )
    new_labels = jnp.stack(
        [
            labels[..., 0],
            (nx1 + nx2) / 2 / w,
            (ny1 + ny2) / 2 / h,
            bw / w,
            bh / h,
        ],
        -1,
    )
    new_labels = jnp.where(ok[..., None], new_labels, 0.0)
    return out, new_labels, ok


def random_fliplr(images, labels, key):
    """Per-image random horizontal flip."""
    b = images.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (b,))
    out = jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)
    lx = jnp.where(flip[:, None], 1.0 - labels[..., 1], labels[..., 1])
    labels = labels.at[..., 1].set(lx)
    return out, labels


def mosaic4(images, labels, masks, key):
    """4-way mosaic inside the batch: image i is combined with 3 random
    batch partners on a 2x canvas, then resized back (device equivalent of
    load_mosaic; label capacity 4*M)."""
    b, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    partners = jax.random.randint(k1, (b, 3), 0, b)
    idx = jnp.concatenate([jnp.arange(b)[:, None], partners], 1)  # [B, 4]
    ctr = jax.random.uniform(k2, (b, 2), minval=0.4, maxval=0.6)

    def one(i):
        quads = images[idx[i]]  # [4, H, W, 3]
        cy, cx = ctr[i, 0] * 2 * h, ctr[i, 1] * 2 * w
        canvas = jnp.full((2 * h, 2 * w, 3), 114.0 / 255.0, images.dtype)
        offs = jnp.stack(
            [
                jnp.stack([cy - h, cx - w]),
                jnp.stack([cy - h, cx]),
                jnp.stack([cy, cx - w]),
                jnp.stack([cy, cx]),
            ]
        ).astype(jnp.int32)
        for q in range(4):
            canvas = jax.lax.dynamic_update_slice(
                canvas, quads[q], (offs[q, 0], offs[q, 1], 0)
            )
        small = jax.image.resize(canvas, (h, w, 3), "bilinear")

        lq = labels[idx[i]]  # [4, M, 5]
        mq = masks[idx[i]]
        outs = []
        for q in range(4):
            oy = offs[q, 0].astype(jnp.float32) / (2 * h)
            ox = offs[q, 1].astype(jnp.float32) / (2 * w)
            l = lq[q]
            outs.append(
                jnp.stack(
                    [
                        l[..., 0],
                        (l[..., 1] * w / (2 * w)) + ox,
                        (l[..., 2] * h / (2 * h)) + oy,
                        l[..., 3] / 2,
                        l[..., 4] / 2,
                    ],
                    -1,
                )
            )
        new_l = jnp.concatenate(outs, 0)
        new_m = jnp.concatenate([mq[q] for q in range(4)], 0)
        # clip to canvas and drop degenerates
        x1 = jnp.clip(new_l[:, 1] - new_l[:, 3] / 2, 0, 1)
        y1 = jnp.clip(new_l[:, 2] - new_l[:, 4] / 2, 0, 1)
        x2 = jnp.clip(new_l[:, 1] + new_l[:, 3] / 2, 0, 1)
        y2 = jnp.clip(new_l[:, 2] + new_l[:, 4] / 2, 0, 1)
        new_l = jnp.stack(
            [new_l[:, 0], (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1
        )
        new_m = new_m & ((x2 - x1) > 2.0 / w) & ((y2 - y1) > 2.0 / h)
        return small, jnp.where(new_m[:, None], new_l, 0.0), new_m

    return jax.vmap(one)(jnp.arange(b))


# --- fast (roofline-friendly) pipeline --------------------------------------
#
# The generic building blocks above are correct but slow on TPU: mosaic4's
# vmapped dynamic_update_slice lowers to scatter (369 ms/16-batch measured
# on v5e), hsv's jnp.choose to gathers (63 ms), and the gather-based warp
# costs 78 ms — together they out-cost the train step itself
# (scripts/bench_device_augment.py).  The fast path below expresses the
# same augmentation family in ops XLA maps well:
#   * mosaic = STATIC 2x2 concat (pure data movement); the reference's
#     random mosaic center (utils/datasets.py:681-750) folds into the next
#     stage's random translate — NOTE deviation: same family, slightly
#     different joint distribution
#   * scale+translate resample via jax.image.scale_and_translate (two 1-D
#     resize matmuls on the MXU) replacing the per-pixel gather warp —
#     exact for the rotation/shear-free default hyps; nonzero
#     degrees/shear/perspective falls back to the generic warp
#   * branchless hue-wheel hsv<->rgb (no jnp.choose)


def mosaic4_grid(images, labels, masks, key):
    """Static 2x2 stitch of image i with 3 random batch partners.
    Returns ([B, 2H, 2W, 3] canvas, canvas-normalized labels [B, 4M, 5],
    masks [B, 4M])."""
    b = images.shape[0]
    partners = jax.random.randint(key, (b, 3), 0, b)
    idx = jnp.concatenate([jnp.arange(b)[:, None], partners], 1)  # [B, 4]
    quads = images[idx]  # [B, 4, H, W, 3]
    top = jnp.concatenate([quads[:, 0], quads[:, 1]], 2)
    bot = jnp.concatenate([quads[:, 2], quads[:, 3]], 2)
    canvas = jnp.concatenate([top, bot], 1)
    lq = labels[idx]  # [B, 4, M, 5]
    mq = masks[idx]
    off = jnp.asarray(
        [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [0.5, 0.5]], jnp.float32
    )  # (ox, oy) per quadrant, canvas-normalized
    new_l = jnp.stack(
        [
            lq[..., 0],
            lq[..., 1] / 2 + off[None, :, None, 0],
            lq[..., 2] / 2 + off[None, :, None, 1],
            lq[..., 3] / 2,
            lq[..., 4] / 2,
        ],
        -1,
    )
    m = lq.shape[2]
    new_l = new_l.reshape(b, 4 * m, 5)
    new_m = mq.reshape(b, 4 * m)
    return canvas, jnp.where(new_m[..., None], new_l, 0.0), new_m


def _resample_core(canvas, labels, masks, s, tx, ty, flip, out_hw,
                   fill=114.0 / 255.0):
    """Per-image scale+translate(+flip) resample [B,Hs,Ws,3] -> [B,H,W,3]
    as two batched tent-weight einsums (dense separable bilinear — pure
    MXU work, no gathers/scatters; vmapped scale_and_translate measured
    351 ms/16-batch on v5e, this form ~10 ms), labels through the same
    linear map, border filled with YOLO grey via the src-fill linearity
    trick.

    Map (index coords): src = (dst - t)/s + src_center, i.e. the source
    center lands at t with zoom s — the composition the generic path
    expresses as resize(2x->1x) then affine about the center."""
    h, w = out_hw
    hs, ws = canvas.shape[1:3]
    cy, cx = hs / 2.0, ws / 2.0

    oy = jnp.arange(h, dtype=jnp.float32)
    ox = jnp.arange(w, dtype=jnp.float32)
    # horizontal flip folds into the sample positions for free
    ox_eff = jnp.where(flip[:, None], (w - 1.0) - ox[None, :], ox[None, :])
    uy = (oy[None, :] - ty[:, None]) / s[:, None] + cy  # [B, h]
    ux = (ox_eff - tx[:, None]) / s[:, None] + cx       # [B, w]
    iy = jnp.arange(hs, dtype=jnp.float32)
    ix = jnp.arange(ws, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[:, :, None] - iy))  # [B, h, Hs]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[:, :, None] - ix))  # [B, w, Ws]
    # rows whose tent mass leaves the source lose weight; the missing mass
    # times `fill` is restored by resampling (src - fill) and adding fill
    # back — exactly map_coordinates(order=1, constant, cval=fill)
    src = canvas - fill
    # default matmul precision: bf16 inputs / fp32 accumulation on TPU —
    # ample for 8-bit image data (the reference's cv2 pipeline is uint8),
    # and 5.6x faster than Precision.HIGHEST on v5e (304.9 -> 54.3 ms,
    # scripts/probe_resample_forms.py); CPU (tests) is exact fp32 either way
    tmp = jnp.einsum("boi,biwc->bowc", wy, src)
    out = jnp.einsum("bpj,bojc->bopc", wx, tmp) + fill

    # labels: canvas-normalized -> output px through the same linear map
    sx = labels[..., 1] * ws
    sy = labels[..., 2] * hs
    bw = labels[..., 3] * ws * s[:, None]
    bh = labels[..., 4] * hs * s[:, None]
    ox = s[:, None] * (sx - cx) + tx[:, None]
    oy = s[:, None] * (sy - cy) + ty[:, None]
    ox = jnp.where(flip[:, None], w - ox, ox)
    x1 = jnp.clip(ox - bw / 2, 0, w)
    x2 = jnp.clip(ox + bw / 2, 0, w)
    y1 = jnp.clip(oy - bh / 2, 0, h)
    y2 = jnp.clip(oy + bh / 2, 0, h)
    nw, nh = x2 - x1, y2 - y1
    ok = masks & (nw > 2) & (nh > 2) & (nw / (nh + 1e-9) < 20) & (
        nh / (nw + 1e-9) < 20
    )
    new_l = jnp.stack(
        [
            labels[..., 0],
            (x1 + x2) / 2 / w,
            (y1 + y2) / 2 / h,
            nw / w,
            nh / h,
        ],
        -1,
    )
    return out, jnp.where(ok[..., None], new_l, 0.0), ok


def scale_translate_flip(canvas, labels, masks, key, out_hw,
                         translate=0.1, scale=0.5, fliplr=0.5):
    """Random scale/translate/flip resample (the degrees=shear=0 fast path
    of random_perspective + fliplr, fused into one resample)."""
    h, w = out_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = canvas.shape[0]
    s = jax.random.uniform(k1, (b,), minval=1 - scale, maxval=1 + scale)
    tx = jax.random.uniform(
        k2, (b,), minval=(0.5 - translate) * w, maxval=(0.5 + translate) * w
    )
    ty = jax.random.uniform(
        k3, (b,), minval=(0.5 - translate) * h, maxval=(0.5 + translate) * h
    )
    flip = jax.random.bernoulli(k4, fliplr, (b,))
    return _resample_core(canvas, labels, masks, s, tx, ty, flip, out_hw)


def random_hsv_fast(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """Branchless HSV jitter: same math as random_hsv but hue-wheel
    formulas instead of jnp.choose (select chains fuse; choose gathers)."""
    b = images.shape[0]
    r = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0) * jnp.asarray(
        [hgain, sgain, vgain]
    ) + 1.0
    rc, gc, bc = images[..., 0], images[..., 1], images[..., 2]
    maxc = jnp.maximum(jnp.maximum(rc, gc), bc)
    minc = jnp.minimum(jnp.minimum(rc, gc), bc)
    d = maxc - minc
    d_safe = jnp.where(d == 0, 1.0, d)
    hh = jnp.where(
        maxc == rc,
        ((gc - bc) / d_safe) % 6.0,
        jnp.where(maxc == gc, (bc - rc) / d_safe + 2.0,
                  (rc - gc) / d_safe + 4.0),
    )
    hh = jnp.where(d == 0, 0.0, hh) / 6.0
    ss = jnp.where(maxc > 0, d / (maxc + 1e-12), 0.0)
    vv = maxc
    hh = (hh * r[:, None, None, 0]) % 1.0
    ss = jnp.clip(ss * r[:, None, None, 1], 0, 1)
    vv = jnp.clip(vv * r[:, None, None, 2], 0, 1)

    def chan(n):
        k = (n + hh * 6.0) % 6.0
        return vv - vv * ss * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], -1)


def augment_batch(images, labels, masks, key, hyp: Dict):
    """Full device augmentation pipeline: mosaic -> geometry -> HSV -> flip
    (fast formulations; generic gather-warp fallback when rotation/shear/
    perspective hyps are nonzero)."""
    h, w = images.shape[1:3]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fast_geom = (
        float(hyp.get("degrees", 0.0)) == 0.0
        and float(hyp.get("shear", 0.0)) == 0.0
        and float(hyp.get("perspective", 0.0)) == 0.0
    )
    if fast_geom:
        if hyp.get("mosaic", 0.0) > 0:
            canvas, labels, masks = mosaic4_grid(images, labels, masks, k1)
        else:
            canvas = images
        images, labels, masks = scale_translate_flip(
            canvas, labels, masks, k2, (h, w),
            translate=float(hyp.get("translate", 0.1)),
            scale=float(hyp.get("scale", 0.5)),
            fliplr=float(hyp.get("fliplr", 0.5)),
        )
        images = random_hsv_fast(
            images, k3, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7),
            hyp.get("hsv_v", 0.4),
        )
        return jnp.clip(images, 0, 1), labels, masks
    return _augment_batch_generic(images, labels, masks, key, hyp)


def _augment_batch_generic(images, labels, masks, key, hyp: Dict):
    """Generic pipeline: mosaic -> gather warp -> HSV -> flip."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if hyp.get("mosaic", 0.0) > 0:
        images, labels, masks = mosaic4(images, labels, masks, k1)
    images, labels, masks = random_affine(
        images, labels, masks, k2,
        degrees=float(hyp.get("degrees", 0.0)),
        translate=float(hyp.get("translate", 0.1)),
        scale=float(hyp.get("scale", 0.5)),
        shear=float(hyp.get("shear", 0.0)),
    )
    images = random_hsv(
        images, k3, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7),
        hyp.get("hsv_v", 0.4),
    )
    images, labels = random_fliplr(images, labels, k4)
    return jnp.clip(images, 0, 1), labels, masks
