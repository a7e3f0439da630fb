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
