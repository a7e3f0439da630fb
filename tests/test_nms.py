"""NMS parity tests against a numpy greedy-NMS oracle (torchvision semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.ops.nms import non_max_suppression, v10_postprocess
from ecs_yolo_tpu.ops.boxes import xywh2xyxy, box_iou, bbox_iou


def np_greedy_nms(boxes, scores, iou_thres):
    """Reference-style greedy NMS (same keep-set as torchvision.ops.nms)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (xx2 - xx1).clip(0) * (yy2 - yy1).clip(0)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > iou_thres
    return keep


def random_pred(rng, a=200, nc=7, batch=2):
    """Random v1-style predictions [B, A, 5+nc] (xywh pixels, obj, cls)."""
    xy = rng.rand(batch, a, 2) * 600 + 20
    wh = rng.rand(batch, a, 2) * 100 + 5
    obj = rng.rand(batch, a, 1)
    cls = rng.rand(batch, a, nc)
    return np.concatenate([xy, wh, obj, cls], -1).astype(np.float32)


class TestNMS:
    @pytest.mark.parametrize("multi_label", [False, True])
    def test_matches_numpy_oracle(self, multi_label):
        rng = np.random.RandomState(0)
        pred = random_pred(rng)
        conf_t, iou_t = 0.25, 0.45
        out, valid = non_max_suppression(
            jnp.asarray(pred),
            conf_thres=conf_t,
            iou_thres=iou_t,
            multi_label=multi_label,
            max_det=20,
        )
        out, valid = np.asarray(out), np.asarray(valid)

        for bi in range(pred.shape[0]):
            x = pred[bi]
            scores_all = x[:, 5:] * x[:, 4:5]
            boxes = np.asarray(xywh2xyxy(jnp.asarray(x[:, :4])))
            if multi_label:
                ai, ci = np.nonzero(scores_all > conf_t)
                cand_boxes = boxes[ai]
                cand_scores = scores_all[ai, ci]
                cand_cls = ci.astype(np.float32)
            else:
                ci = scores_all.argmax(1)
                cand_scores = scores_all.max(1)
                m = cand_scores > conf_t
                cand_boxes, cand_scores, cand_cls = (
                    boxes[m],
                    cand_scores[m],
                    ci[m].astype(np.float32),
                )
            off = cand_boxes + cand_cls[:, None] * 4096.0
            keep = np_greedy_nms(off, cand_scores, iou_t)[:20]  # cap = max_det
            want = sorted(
                zip(cand_scores[keep].round(5), cand_cls[keep]), reverse=True
            )
            got_rows = out[bi][valid[bi]]
            got = sorted(
                zip(got_rows[:, 4].round(5), got_rows[:, 5]), reverse=True
            )
            assert len(got) == len(want)
            for (gs, gc), (ws, wc) in zip(got, want):
                assert gs == pytest.approx(ws, abs=1e-4)
                assert gc == wc

    def test_padded_rows_are_zero(self):
        rng = np.random.RandomState(1)
        pred = random_pred(rng, a=50)
        out, valid = non_max_suppression(jnp.asarray(pred), conf_thres=0.9, max_det=20)
        out, valid = np.asarray(out), np.asarray(valid)
        assert (out[~valid] == 0).all()

    def test_zero_area_box_not_duplicated(self):
        # a degenerate (zero-area) candidate has IoU 0 with itself, so
        # self-suppression via IoU alone never kills it — it must be kept
        # exactly once, not re-picked max_det times (ADVICE r1)
        pred = np.zeros((1, 3, 5 + 2), dtype=np.float32)
        pred[0, 0, :4] = [100, 100, 0, 0]  # zero wh
        pred[0, 0, 4] = 1.0
        pred[0, 0, 5] = 0.95
        pred[0, 1, :4] = [300, 300, 40, 40]
        pred[0, 1, 4] = 1.0
        pred[0, 1, 6] = 0.9
        out, valid = non_max_suppression(jnp.asarray(pred), max_det=20)
        out, valid = np.asarray(out)[0], np.asarray(valid)[0]
        assert int(valid.sum()) == 2
        kept = out[valid]
        # no duplicated rows
        assert len(np.unique(kept.round(3), axis=0)) == 2

    def test_merge_nms_matches_oracle(self):
        """merge=True (reference utils/general.py:727-732): kept boxes become
        the score-weighted mean of overlapping candidates; with redundancy a
        kept box needs a supporting overlap."""
        rng = np.random.RandomState(3)
        pred = random_pred(rng, a=120, nc=3)
        conf_t, iou_t = 0.25, 0.5
        out, valid = non_max_suppression(
            jnp.asarray(pred), conf_thres=conf_t, iou_thres=iou_t,
            max_det=20, merge=True,
        )
        out, valid = np.asarray(out), np.asarray(valid)

        for bi in range(pred.shape[0]):
            x = pred[bi]
            scores_all = x[:, 5:] * x[:, 4:5]
            best = scores_all.max(-1)
            cls = scores_all.argmax(-1)
            boxes = np.asarray(xywh2xyxy(jnp.asarray(x[:, :4])))
            off = boxes + cls[:, None] * 4096.0
            ok_cand = best > conf_t
            s = np.where(ok_cand, best, -1e9)
            keep = np_greedy_nms(off, s, iou_t)[:20]
            keep = [i for i in keep if best[i] > conf_t]
            areas = (off[:, 2] - off[:, 0]).clip(0) * (
                off[:, 3] - off[:, 1]).clip(0)
            rows = []
            for i in keep:
                xx1 = np.maximum(off[i, 0], off[:, 0])
                yy1 = np.maximum(off[i, 1], off[:, 1])
                xx2 = np.minimum(off[i, 2], off[:, 2])
                yy2 = np.minimum(off[i, 3], off[:, 3])
                inter = (xx2 - xx1).clip(0) * (yy2 - yy1).clip(0)
                iou = inter / (areas[i] + areas - inter + 1e-7)
                overlap = (iou > iou_t) & ok_cand
                if overlap.sum() <= 1:  # redundant filter
                    continue
                w = overlap * best
                merged = (w @ boxes) / w.sum()
                rows.append(np.concatenate([merged, [best[i], cls[i]]]))
            got = out[bi][valid[bi]]
            want = np.stack(rows) if rows else np.zeros((0, 6))
            assert got.shape == want.shape, (got.shape, want.shape)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_agnostic_suppresses_across_classes(self):
        # two identical boxes, different classes: agnostic keeps 1, per-class 2
        pred = np.zeros((1, 2, 5 + 3), dtype=np.float32)
        pred[0, :, :4] = [100, 100, 50, 50]
        pred[0, :, 4] = 1.0
        pred[0, 0, 5] = 0.9
        pred[0, 1, 6] = 0.8
        _, v1 = non_max_suppression(jnp.asarray(pred), agnostic=False, max_det=20)
        _, v2 = non_max_suppression(jnp.asarray(pred), agnostic=True, max_det=20)
        assert int(np.asarray(v1).sum()) == 2
        assert int(np.asarray(v2).sum()) == 1

    def test_dfl_layout(self):
        # [B, 4+nc, A] layout without objectness
        rng = np.random.RandomState(2)
        a, nc = 100, 4
        pred = np.concatenate(
            [
                rng.rand(1, 2, a) * 600 + 20,
                rng.rand(1, 2, a) * 80 + 5,
                rng.rand(1, nc, a),
            ],
            axis=1,
        ).astype(np.float32)
        out, valid = non_max_suppression(
            jnp.asarray(pred), has_obj=False, conf_thres=0.5, max_det=20
        )
        assert out.shape == (1, 20, 6)
        assert np.asarray(valid).sum() > 0


class TestV10Postprocess:
    def test_topk(self):
        rng = np.random.RandomState(3)
        a, nc = 64, 5
        pred = np.concatenate(
            [rng.rand(2, 4, a) * 100, rng.rand(2, nc, a)], axis=1
        ).astype(np.float32)
        out, valid = v10_postprocess(jnp.asarray(pred), max_det=10)
        out = np.asarray(out)
        scores = pred[:, 4:, :].transpose(0, 2, 1).reshape(2, -1)
        want_top = -np.sort(-scores, axis=1)[:, :10]
        np.testing.assert_allclose(out[..., 4], want_top, atol=1e-6)


class TestIoU:
    def test_box_iou_identity(self):
        b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
        m = np.asarray(box_iou(b, b))
        np.testing.assert_allclose(np.diag(m), [1.0, 1.0], atol=1e-6)
        assert m[0, 1] == pytest.approx(25 / 175, abs=1e-5)

    @pytest.mark.parametrize("kind", ["GIoU", "DIoU", "CIoU", "SIoU", "EIoU"])
    def test_variants_bounded(self, kind):
        rng = np.random.RandomState(4)
        b1 = np.concatenate([rng.rand(64, 2) * 50, rng.rand(64, 2) * 30 + 1], -1)
        b2 = np.concatenate([rng.rand(64, 2) * 50, rng.rand(64, 2) * 30 + 1], -1)
        v = np.asarray(
            bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=True, **{kind: True})
        )
        assert np.isfinite(v).all()
        assert (v <= 1.0 + 1e-5).all() and (v >= -3.0).all()

    def test_plain_iou_equals_matrix(self):
        rng = np.random.RandomState(5)
        b = np.concatenate([rng.rand(8, 2) * 50, rng.rand(8, 2) * 30 + 1], -1).astype(
            np.float32
        )
        el = np.asarray(bbox_iou(jnp.asarray(b), jnp.asarray(b), xywh=True))
        np.testing.assert_allclose(el, np.ones(8), atol=1e-5)


def test_wiou():
    from ecs_yolo_tpu.ops.boxes import wiou

    b1 = jnp.asarray([[10.0, 10, 4, 4]])
    iou_same, pen_same = wiou(b1, b1)
    assert float(iou_same[0]) == pytest.approx(1.0, abs=1e-5)
    assert float(pen_same[0]) == pytest.approx(1.0, abs=1e-5)
    b2 = jnp.asarray([[20.0, 20, 4, 4]])
    iou_far, pen_far = wiou(b1, b2)
    assert float(iou_far[0]) == 0.0
    assert float(pen_far[0]) > 1.0
