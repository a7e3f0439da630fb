"""Device-side augmentation tests (jit on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.data.device_augment import (
    rgb_to_hsv,
    hsv_to_rgb,
    random_hsv,
    random_affine,
    random_fliplr,
    mosaic4,
    augment_batch,
)

KEY = jax.random.PRNGKey(0)


def batch(b=4, h=32, w=32, m=6):
    rng = np.random.RandomState(0)
    ims = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    labels = np.zeros((b, m, 5), np.float32)
    masks = np.zeros((b, m), bool)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [0, 0.3, 0.3, 0.2, 0.2]
    masks[:, :2] = True
    return ims, jnp.asarray(labels), jnp.asarray(masks)


def test_hsv_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
    back = hsv_to_rgb(rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_random_hsv_range():
    ims, _, _ = batch()
    out = random_hsv(ims, KEY)
    assert out.shape == ims.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1.0 + 1e-6


def test_random_affine_identityish():
    ims, labels, masks = batch()
    out, nl, nm = random_affine(
        ims, labels, masks, KEY, degrees=0.0, translate=0.0, scale=0.0,
        shear=0.0,
    )
    # pure centering transform with T=0.5 offset -> identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(ims), atol=1e-4)
    kept = np.asarray(nm)
    np.testing.assert_array_equal(kept, np.asarray(masks))
    np.testing.assert_allclose(
        np.asarray(nl)[kept], np.asarray(labels)[kept], atol=1e-5
    )


def test_random_affine_moves_boxes():
    ims, labels, masks = batch()
    out, nl, nm = random_affine(
        ims, labels, masks, jax.random.PRNGKey(3),
        degrees=15.0, translate=0.2, scale=0.4, shear=5.0,
    )
    assert out.shape == ims.shape
    assert bool(jnp.isfinite(nl).all())


def test_fliplr():
    ims, labels, _ = batch()
    out, nl = random_fliplr(ims, labels, jax.random.PRNGKey(1))
    # flipped images keep content (same sorted pixel values per row)
    assert out.shape == ims.shape


def test_mosaic4_shapes():
    ims, labels, masks = batch(b=4, m=6)
    out, nl, nm = mosaic4(ims, labels, masks, KEY)
    assert out.shape == ims.shape
    assert nl.shape == (4, 24, 5)  # 4x label capacity
    assert bool(nm.any())
    valid = np.asarray(nl)[np.asarray(nm)]
    assert (valid[:, 1:] >= 0).all() and (valid[:, 1:] <= 1).all()


def test_full_pipeline_jits():
    ims, labels, masks = batch()
    hyp = dict(mosaic=1.0, degrees=5.0, translate=0.1, scale=0.3)
    out, nl, nm = augment_batch(ims, labels, masks, KEY, hyp)
    assert out.shape == ims.shape
    assert bool(jnp.isfinite(out).all())


# --- fast (roofline) pipeline ------------------------------------------------

from ecs_yolo_tpu.data.device_augment import (  # noqa: E402
    _resample_core,
    mosaic4_grid,
    random_hsv_fast,
    scale_translate_flip,
)


def test_resample_core_identity():
    """s=1, t=center, no flip must be the identity map."""
    ims, labels, masks = batch()
    b, h, w = ims.shape[:3]
    s = jnp.ones((b,))
    tx = jnp.full((b,), w / 2.0)
    ty = jnp.full((b,), h / 2.0)
    flip = jnp.zeros((b,), bool)
    out, nl, nm = _resample_core(ims, labels, masks, s, tx, ty, flip, (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ims), atol=1e-5)
    kept = np.asarray(nm)
    np.testing.assert_array_equal(kept, np.asarray(masks))
    np.testing.assert_allclose(
        np.asarray(nl)[kept], np.asarray(labels)[kept], atol=1e-5
    )


def test_resample_core_matches_gather_warp():
    """The MXU resample must agree with the generic gather warp for the
    same (s, t) map (interior pixels; both bilinear)."""
    from jax.scipy.ndimage import map_coordinates

    rng = np.random.RandomState(3)
    h = w = 24
    img = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    labels = jnp.zeros((1, 2, 5))
    masks = jnp.zeros((1, 2), bool)
    s, tx, ty = 0.7, 10.0, 14.0
    out, _, _ = _resample_core(
        img, labels, masks, jnp.asarray([s]), jnp.asarray([tx]),
        jnp.asarray([ty]), jnp.zeros((1,), bool), (h, w),
    )
    # reference: src = (dst - t)/s + c  per axis, bilinear, grey border
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sy = (ys - ty) / s + h / 2.0
    sx = (xs - tx) / s + w / 2.0
    ref = np.stack(
        [
            np.asarray(
                map_coordinates(img[0, :, :, c], [sy, sx], order=1,
                                mode="constant", cval=114.0 / 255.0)
            )
            for c in range(3)
        ],
        -1,
    )
    # compare away from the border seam (kernel edge handling differs)
    inner = np.zeros((h, w), bool)
    valid_y = (sy > 0.5) & (sy < h - 1.5)
    valid_x = (sx > 0.5) & (sx < w - 1.5)
    inner = valid_y & valid_x
    np.testing.assert_allclose(
        np.asarray(out[0])[inner], ref[inner], atol=1e-4
    )


def test_resample_flip_labels():
    ims, labels, masks = batch()
    b, h, w = ims.shape[:3]
    s = jnp.ones((b,))
    tx = jnp.full((b,), w / 2.0)
    ty = jnp.full((b,), h / 2.0)
    flip = jnp.ones((b,), bool)
    out, nl, nm = _resample_core(ims, labels, masks, s, tx, ty, flip, (h, w))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ims)[:, :, ::-1], atol=1e-5
    )
    kept = np.asarray(nm)
    got = np.asarray(nl)[kept]
    want = np.asarray(labels)[kept]
    np.testing.assert_allclose(got[:, 1], 1.0 - want[:, 1], atol=1e-5)
    np.testing.assert_allclose(got[:, 2:], want[:, 2:], atol=1e-5)


def test_mosaic4_grid_labels_inside():
    ims, labels, masks = batch()
    canvas, nl, nm = mosaic4_grid(ims, labels, masks, KEY)
    b, h, w = ims.shape[:3]
    assert canvas.shape == (b, 2 * h, 2 * w, 3)
    assert nl.shape == (b, 4 * labels.shape[1], 5)
    kept = np.asarray(nm)
    got = np.asarray(nl)[kept]
    assert (got[:, 1:] >= 0).all() and (got[:, 1:] <= 1).all()
    # quadrant 0 is image i itself at half scale
    np.testing.assert_allclose(
        np.asarray(canvas)[:, :h, :w], np.asarray(ims), atol=1e-6
    )


def test_random_hsv_fast_matches_generic():
    ims, _, _ = batch()
    a = random_hsv(ims, KEY)
    b_ = random_hsv_fast(ims, KEY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_fast_pipeline_jits_and_filters():
    ims, labels, masks = batch(h=64, w=64)
    hyp = dict(mosaic=1.0, translate=0.1, scale=0.5, fliplr=0.5,
               hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    out, nl, nm = jax.jit(lambda *a: augment_batch(*a, hyp))(
        ims, labels, masks, KEY
    )
    assert out.shape == ims.shape
    assert nl.shape[1] == 4 * labels.shape[1]
    assert float(out.min()) >= 0 and float(out.max()) <= 1.0 + 1e-6
    kept = np.asarray(nm)
    got = np.asarray(nl)[kept]
    if len(got):
        assert (got[:, 1:] >= 0).all() and (got[:, 1:] <= 1).all()


def test_fast_pipeline_falls_back_on_rotation():
    ims, labels, masks = batch(h=32, w=32)
    hyp = dict(mosaic=0.0, degrees=10.0, translate=0.1, scale=0.2,
               fliplr=0.0)
    out, nl, nm = augment_batch(ims, labels, masks, KEY, hyp)
    assert out.shape == ims.shape  # generic path keeps M (no mosaic)
    assert nl.shape == labels.shape
