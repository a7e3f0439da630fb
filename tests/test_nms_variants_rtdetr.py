"""Tests for NMS variants and RT-DETR matching/loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.ops.nms_variants import (
    soft_nms,
    cluster_nms,
    cluster_diou_nms,
    cluster_spm_nms,
)
from ecs_yolo_tpu.train.rtdetr import (
    hungarian_match,
    get_cdn_group,
    rtdetr_loss,
)
from tests.test_nms import np_greedy_nms


def rand_boxes(rng, n=64):
    xy = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 60 + 10
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestClusterNMS:
    def test_matches_greedy(self):
        rng = np.random.RandomState(0)
        boxes = rand_boxes(rng)
        scores = rng.rand(64).astype(np.float32)
        order, keep = cluster_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        got = set(np.asarray(order)[np.asarray(keep)].tolist())
        want = set(np_greedy_nms(boxes, scores, 0.5))
        assert got == want

    def test_diou_variant_runs(self):
        rng = np.random.RandomState(1)
        boxes = rand_boxes(rng, 32)
        scores = rng.rand(32).astype(np.float32)
        order, keep = cluster_diou_nms(jnp.asarray(boxes), jnp.asarray(scores))
        # DIoU-NMS suppresses at least as much as plain IoU
        assert 0 < int(np.asarray(keep).sum()) <= 32


class TestSoftNMS:
    def test_decays_overlaps(self):
        boxes = jnp.asarray(
            [[0, 0, 100, 100], [5, 5, 105, 105], [300, 300, 400, 400]],
            jnp.float32,
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        idx, kept = soft_nms(boxes, scores, score_thres=0.1, max_det=3)
        kept = np.asarray(kept)
        # top box unchanged, overlapping 2nd decayed, far box unchanged
        assert kept[0] == pytest.approx(0.9, abs=1e-5)
        assert 0 < kept[list(np.asarray(idx)).index(1)] < 0.8
        assert kept[list(np.asarray(idx)).index(2)] == pytest.approx(0.7, abs=1e-5)

    def test_spm_penalizes(self):
        rng = np.random.RandomState(2)
        boxes = rand_boxes(rng, 16)
        scores = rng.rand(16).astype(np.float32) * 0.5 + 0.5
        order, keep = cluster_spm_nms(jnp.asarray(boxes), jnp.asarray(scores))
        assert np.asarray(keep).dtype == bool


class TestHungarian:
    def test_perfect_match(self):
        Q, M, nc = 6, 3, 4
        gt_boxes = np.array(
            [[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.2, 0.2], [0.8, 0.8, 0.1, 0.1]],
            np.float32,
        )
        gt_labels = np.array([0, 1, 2], np.float32)
        # queries 0..2 exactly on the gts, 3..5 far off
        pb = np.concatenate([gt_boxes, np.full((3, 4), 0.05, np.float32)])
        ps = np.full((Q, nc), 0.01, np.float32)
        for i in range(3):
            ps[i, int(gt_labels[i])] = 0.95
        mask = np.ones(M, bool)
        row_to_gt, matched = hungarian_match(
            jnp.asarray(ps), jnp.asarray(pb), jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes), jnp.asarray(mask),
        )
        row_to_gt = np.asarray(row_to_gt)
        matched = np.asarray(matched)
        for i in range(3):
            assert matched[i] and row_to_gt[i] == i

    def test_padded_gts_never_matched(self):
        Q, M, nc = 4, 3, 2
        rng = np.random.RandomState(3)
        ps = rng.rand(Q, nc).astype(np.float32)
        pb = rng.rand(Q, 4).astype(np.float32) * 0.5 + 0.25
        gt_b = rng.rand(M, 4).astype(np.float32) * 0.5 + 0.25
        gt_l = np.zeros(M, np.float32)
        mask = np.array([True, False, False])
        row_to_gt, matched = hungarian_match(
            jnp.asarray(ps), jnp.asarray(pb), jnp.asarray(gt_l),
            jnp.asarray(gt_b), jnp.asarray(mask),
        )
        assert np.asarray(matched).sum() == 1


class TestCDN:
    def test_group_shapes_and_negatives(self):
        B, M, nc = 2, 5, 7
        rng = np.random.RandomState(4)
        gl = rng.randint(0, nc, (B, M)).astype(np.float32)
        gb = (rng.rand(B, M, 4) * 0.4 + 0.3).astype(np.float32)
        gm = np.ones((B, M), bool)
        dl, db, dm = get_cdn_group(
            jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm),
            nc, 100, jax.random.PRNGKey(0),
        )
        assert dl.shape == (B, 2 * M)
        assert db.shape == (B, 2 * M, 4)
        # negative half labeled as background class
        assert (np.asarray(dl)[:, M:] == nc).all()


class TestRTDETRLoss:
    def test_finite_and_grad(self):
        B, Q, M, nc = 2, 8, 4, 3
        rng = np.random.RandomState(5)
        ps = jnp.asarray(rng.randn(B, Q, nc).astype(np.float32))
        pb = jnp.asarray((rng.rand(B, Q, 4) * 0.5 + 0.25).astype(np.float32))
        gl = jnp.asarray(rng.randint(0, nc, (B, M)).astype(np.float32))
        gb = jnp.asarray((rng.rand(B, M, 4) * 0.4 + 0.3).astype(np.float32))
        gm = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool))
        total, items = rtdetr_loss(ps, pb, gl, gb, gm, nc)
        assert np.isfinite(float(total))

        g = jax.grad(lambda s: rtdetr_loss(s, pb, gl, gb, gm, nc)[0])(ps)
        assert float(jnp.abs(g).sum()) > 0
