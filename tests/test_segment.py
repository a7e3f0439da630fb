"""Segment head + mask loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.nn.segment import Segment, crop_mask, segment_mask_loss

SNN = SNNConfig(time_window=2)
KEY = jax.random.PRNGKey(0)


def feats(b=2):
    rng = np.random.RandomState(0)
    return [
        jnp.asarray(rng.randn(2, b, 8, 8, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, b, 4, 4, 64).astype(np.float32)),
    ]


class TestSegmentHead:
    def test_train_outputs(self):
        xs = feats()
        head = Segment(nc=3, nm=8, npr=16, strides=(8.0, 16.0), snn=SNN)
        v = head.init(KEY, xs, training=True)
        (out, mc, protos), _ = head.apply(
            v, xs, training=True, mutable=["batch_stats"]
        )
        assert len(out) == 2
        assert out[0].shape == (2, 3 + 64, 8, 8)
        assert mc.shape == (2, 8, 8 * 8 + 4 * 4)
        assert protos.shape == (2, 16, 16, 8)  # 2x upsampled from P3

    def test_eval_outputs(self):
        xs = feats()
        head = Segment(nc=3, nm=8, npr=16, strides=(8.0, 16.0), snn=SNN)
        v = head.init(KEY, xs, training=True)
        y, aux = head.apply(v, xs, training=False)
        assert y.shape[1] == 4 + 3 + 8  # box + cls + mask coeffs


def test_crop_mask():
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2, 6, 6], [0, 0, 8, 8]])
    out = np.asarray(crop_mask(masks, boxes))
    assert out[0].sum() == 16
    assert out[1].sum() == 64


def test_mask_loss_finite_and_grad():
    rng = np.random.RandomState(1)
    N, A, nm, ph, pw, M = 2, 20, 8, 16, 16, 4
    mc = jnp.asarray(rng.randn(N, nm, A).astype(np.float32))
    protos = jnp.asarray(rng.randn(N, ph, pw, nm).astype(np.float32) * 0.1)
    fg = jnp.asarray(rng.rand(N, A) > 0.5)
    tgt_idx = jnp.asarray(rng.randint(0, M, (N, A)))
    gt_masks = jnp.asarray((rng.rand(N, M, ph, pw) > 0.5).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([8.0, 8, 48, 48], np.float32), (N, A, 1))
    )
    loss = segment_mask_loss(mc, protos, fg, tgt_idx, gt_masks, boxes, 8.0)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda m: segment_mask_loss(m, protos, fg, tgt_idx, gt_masks, boxes, 8.0)
    )(mc)
    assert float(jnp.abs(g).sum()) > 0
