"""Loss and assigner tests against independent loop-based numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.ops.boxes import bbox_iou, xywh2xyxy
from ecs_yolo_tpu.ops.anchors import make_anchors
from ecs_yolo_tpu.train.tal import task_aligned_assigner
from ecs_yolo_tpu.train.loss_v1 import build_targets_level, compute_loss_v1
from ecs_yolo_tpu.train.loss_tal import compute_loss_tal

HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)


def make_targets(rng, B=2, M=8, nc=5, n_valid=(3, 5)):
    t = np.zeros((B, M, 5), dtype=np.float32)
    mask = np.zeros((B, M), dtype=bool)
    for b in range(B):
        n = n_valid[b]
        t[b, :n, 0] = rng.randint(0, nc, n)
        t[b, :n, 1:3] = rng.rand(n, 2) * 0.8 + 0.1
        t[b, :n, 3:5] = rng.rand(n, 2) * 0.2 + 0.05
        mask[b, :n] = True
    return t, mask


class TestBuildTargetsV1:
    def test_matches_loop_oracle(self):
        rng = np.random.RandomState(0)
        B, M, na = 2, 8, 3
        ny = nx = 8
        anchor_t = 4.0
        anchors = np.array([[1.2, 1.5], [2.0, 3.5], [4.0, 3.0]], np.float32)
        targets, mask = make_targets(rng, B, M)

        b_, a_, gj_, gi_, tcls_, tbox_, anch_, valid_ = [
            np.asarray(v)
            for v in build_targets_level(
                jnp.asarray(targets), jnp.asarray(mask), jnp.asarray(anchors),
                (ny, nx), anchor_t,
            )
        ]
        got = set(
            (int(b_[i]), int(a_[i]), int(gj_[i]), int(gi_[i]), int(tcls_[i]))
            for i in range(len(b_)) if valid_[i]
        )

        # independent loop oracle of the v5-style 3-neighbor assignment
        want = set()
        g = 0.5
        offs = [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1)]
        for b in range(B):
            for m in range(M):
                if not mask[b, m]:
                    continue
                cls = int(targets[b, m, 0])
                x, y = targets[b, m, 1] * nx, targets[b, m, 2] * ny
                w, h = targets[b, m, 3] * nx, targets[b, m, 4] * ny
                for a in range(na):
                    rw, rh = w / anchors[a, 0], h / anchors[a, 1]
                    if max(rw, 1 / rw, rh, 1 / rh) >= anchor_t:
                        continue
                    oks = [True]
                    oks.append(x % 1 < g and x > 1)  # j
                    oks.append(y % 1 < g and y > 1)  # k
                    oks.append((nx - x) % 1 < g and (nx - x) > 1)  # l
                    oks.append((ny - y) % 1 < g and (ny - y) > 1)  # m
                    for (ox, oy), ok in zip(offs, oks):
                        if not ok:
                            continue
                        gi = int(np.floor(x - ox * g))
                        gj = int(np.floor(y - oy * g))
                        gi = min(max(gi, 0), nx - 1)
                        gj = min(max(gj, 0), ny - 1)
                        want.add((b, a, gj, gi, cls))
        assert got == want


class TestComputeLossV1:
    def _setup(self):
        rng = np.random.RandomState(1)
        B, na, nc = 2, 3, 5
        anchors = jnp.asarray(
            [[[1.2, 1.5], [2.0, 3.5], [4.0, 3.0]],
             [[2.0, 2.0], [3.0, 4.0], [5.0, 4.0]]]
        )
        preds = [
            jnp.asarray(rng.randn(B, na, 8, 8, nc + 5).astype(np.float32)),
            jnp.asarray(rng.randn(B, na, 4, 4, nc + 5).astype(np.float32)),
        ]
        targets, mask = make_targets(rng, B, nc=nc)
        return preds, jnp.asarray(targets), jnp.asarray(mask), anchors, nc

    def test_finite_and_positive(self):
        preds, targets, mask, anchors, nc = self._setup()
        total, items = compute_loss_v1(preds, targets, mask, anchors, HYP, nc)
        assert np.isfinite(float(total)) and float(total) > 0
        assert np.isfinite(np.asarray(items)).all()

    def test_zero_targets(self):
        preds, targets, mask, anchors, nc = self._setup()
        total, items = compute_loss_v1(
            preds, targets, jnp.zeros_like(mask), anchors, HYP, nc
        )
        # box and cls vanish without targets; obj stays (all-background BCE)
        assert float(items[0]) == 0.0
        assert float(items[2]) == 0.0
        assert float(items[1]) > 0.0

    def test_gradients_flow(self):
        preds, targets, mask, anchors, nc = self._setup()

        def f(p):
            return compute_loss_v1(p, targets, mask, anchors, HYP, nc)[0]

        g = jax.grad(lambda p: f(p))(preds)
        assert sum(float(jnp.abs(x).sum()) for x in g) > 0

    def test_perfect_prediction_lowers_loss(self):
        preds, targets, mask, anchors, nc = self._setup()
        total_rand, _ = compute_loss_v1(preds, targets, mask, anchors, HYP, nc)
        # all-background confident predictions: big negative obj logits
        preds_bg = [p.at[..., 4].set(-10.0) for p in preds]
        total_bg, items = compute_loss_v1(
            preds_bg, targets, jnp.zeros_like(mask), anchors, HYP, nc
        )
        assert float(total_bg) < float(total_rand)


class TestTALAssigner:
    def test_against_loop_oracle(self):
        rng = np.random.RandomState(2)
        B, M, A, nc = 2, 4, 48, 5
        topk, alpha, beta = 3, 0.5, 6.0

        anc = (rng.rand(A, 2) * 32).astype(np.float32)
        pd_scores = rng.rand(B, A, nc).astype(np.float32)
        ctr = rng.rand(B, A, 2) * 32
        sz = rng.rand(B, A, 2) * 8 + 2
        pd_bboxes = np.concatenate([ctr - sz / 2, ctr + sz / 2], -1).astype(np.float32)
        gctr = rng.rand(B, M, 2) * 28 + 2
        gsz = rng.rand(B, M, 2) * 10 + 4
        gt_bboxes = np.concatenate([gctr - gsz / 2, gctr + gsz / 2], -1).astype(np.float32)
        gt_labels = rng.randint(0, nc, (B, M)).astype(np.float32)
        mask_gt = np.ones((B, M), bool)
        mask_gt[0, 3] = False
        gt_bboxes[0, 3] = 0

        res = task_aligned_assigner(
            jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc),
            jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
            topk=topk, num_classes=nc, alpha=alpha, beta=beta,
        )

        # loop oracle
        overlaps = np.zeros((B, M, A), np.float32)
        metric = np.zeros((B, M, A), np.float32)
        in_gts = np.zeros((B, M, A), bool)
        for b in range(B):
            for m in range(M):
                iou = np.asarray(
                    bbox_iou(
                        jnp.asarray(gt_bboxes[b, m])[None],
                        jnp.asarray(pd_bboxes[b]),
                        xywh=False, CIoU=True,
                    )
                ).clip(0)
                overlaps[b, m] = iou
                s = pd_scores[b, :, int(gt_labels[b, m])]
                metric[b, m] = s**alpha * iou**beta
                x1, y1, x2, y2 = gt_bboxes[b, m]
                in_gts[b, m] = (
                    (anc[:, 0] > x1) & (anc[:, 0] < x2)
                    & (anc[:, 1] > y1) & (anc[:, 1] < y2)
                )
        mask_pos = np.zeros((B, M, A), bool)
        for b in range(B):
            for m in range(M):
                if not mask_gt[b, m]:
                    continue
                mm = metric[b, m] * in_gts[b, m]
                top = np.argsort(-mm)[:topk]
                for a in top:
                    if in_gts[b, m, a]:
                        mask_pos[b, m, a] = True
        # conflict resolution: highest overlap wins
        fg = mask_pos.sum(1)
        for b in range(B):
            for a in range(A):
                if fg[b, a] > 1:
                    best = np.argmax(overlaps[b, :, a])
                    mask_pos[b, :, a] = False
                    mask_pos[b, best, a] = True
        fg = mask_pos.sum(1) > 0
        np.testing.assert_array_equal(np.asarray(res.fg_mask), fg)

        tgt_idx = mask_pos.argmax(1)
        for b in range(B):
            for a in range(A):
                if fg[b, a]:
                    assert int(np.asarray(res.target_labels)[b, a]) == int(
                        gt_labels[b, tgt_idx[b, a]]
                    )
                    np.testing.assert_allclose(
                        np.asarray(res.target_bboxes)[b, a],
                        gt_bboxes[b, tgt_idx[b, a]], atol=1e-5,
                    )

    def test_empty_gt(self):
        B, M, A, nc = 1, 4, 16, 3
        res = task_aligned_assigner(
            jnp.ones((B, A, nc)) * 0.5,
            jnp.ones((B, A, 4)),
            jnp.ones((A, 2)),
            jnp.zeros((B, M)),
            jnp.zeros((B, M, 4)),
            jnp.zeros((B, M), bool),
            topk=3, num_classes=nc,
        )
        assert not bool(np.asarray(res.fg_mask).any())
        assert float(np.asarray(res.target_scores).sum()) == 0.0


class TestComputeLossTAL:
    def _setup(self):
        rng = np.random.RandomState(3)
        B, nc, reg_max = 2, 5, 16
        no = nc + 4 * reg_max
        feats = [
            jnp.asarray(rng.randn(B, no, 8, 8).astype(np.float32)),
            jnp.asarray(rng.randn(B, no, 4, 4).astype(np.float32)),
        ]
        targets, mask = make_targets(rng, B, nc=nc)
        return feats, jnp.asarray(targets), jnp.asarray(mask), (8.0, 16.0), nc

    def test_finite(self):
        feats, targets, mask, strides, nc = self._setup()
        total, items = compute_loss_tal(feats, targets, mask, strides, nc)
        assert np.isfinite(float(total))
        assert np.isfinite(np.asarray(items)).all()

    def test_zero_targets(self):
        feats, targets, mask, strides, nc = self._setup()
        total, items = compute_loss_tal(
            feats, targets, jnp.zeros_like(mask), strides, nc
        )
        assert float(items[0]) == 0.0  # box
        assert float(items[2]) == 0.0  # dfl

    def test_gradients_flow(self):
        feats, targets, mask, strides, nc = self._setup()
        g = jax.grad(
            lambda f: compute_loss_tal(f, targets, mask, strides, nc)[0]
        )(feats)
        assert sum(float(jnp.abs(x).sum()) for x in g) > 0
