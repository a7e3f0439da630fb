"""Metric tests with hand-computable scenarios."""

import numpy as np
import pytest

from ecs_yolo_tpu.ops.metrics import (
    ap_per_class,
    compute_ap,
    process_batch,
    fitness,
    ConfusionMatrix,
    box_iou_np,
)


class TestProcessBatch:
    def test_perfect_match(self):
        labels = np.array([[0, 10, 10, 50, 50], [1, 60, 60, 90, 90]], float)
        dets = np.array(
            [[10, 10, 50, 50, 0.9, 0], [60, 60, 90, 90, 0.8, 1]], float
        )
        iouv = np.linspace(0.5, 0.95, 10)
        correct = process_batch(dets, labels, iouv)
        assert correct.all()

    def test_wrong_class_no_match(self):
        labels = np.array([[0, 10, 10, 50, 50]], float)
        dets = np.array([[10, 10, 50, 50, 0.9, 1]], float)
        correct = process_batch(dets, labels, np.array([0.5]))
        assert not correct.any()

    def test_one_gt_matches_once(self):
        # two detections on one gt: only the higher-IoU one is TP
        labels = np.array([[0, 10, 10, 50, 50]], float)
        dets = np.array(
            [[10, 10, 50, 50, 0.6, 0], [12, 12, 52, 52, 0.9, 0]], float
        )
        correct = process_batch(dets, labels, np.array([0.5]))
        assert correct.sum() == 1

    def test_iou_threshold(self):
        labels = np.array([[0, 0, 0, 100, 100]], float)
        dets = np.array([[0, 0, 100, 60, 0.9, 0]], float)  # IoU = 0.6
        # exact IoU is 0.6 but the eps in the denominator nudges it below
        # the 0.6 threshold (same arithmetic as the reference)
        iouv = np.array([0.5, 0.55, 0.6, 0.65])
        correct = process_batch(dets, labels, iouv)
        np.testing.assert_array_equal(correct[0], [True, True, False, False])


class TestAP:
    def test_perfect_detector(self):
        n = 20
        tp = np.ones((n, 1), bool)
        conf = np.linspace(0.9, 0.1, n)
        pred_cls = np.zeros(n)
        target_cls = np.zeros(n)
        _, _, p, r, f1, ap, cls = ap_per_class(tp, conf, pred_cls, target_cls)
        assert ap[0, 0] == pytest.approx(1.0, abs=1e-2)

    def test_half_detector(self):
        # every second detection is a FP, all 10 gts found
        tp = np.array([[True, False] * 10]).reshape(-1, 1)
        conf = np.linspace(0.9, 0.1, 20)
        pred_cls = np.zeros(20)
        target_cls = np.zeros(10)
        _, _, p, r, f1, ap, cls = ap_per_class(tp, conf, pred_cls, target_cls)
        assert 0.3 < ap[0, 0] < 1.0

    def test_compute_ap_monotone_envelope(self):
        ap, mpre, mrec = compute_ap(
            np.array([0.2, 0.4, 0.8]), np.array([1.0, 0.6, 0.8])
        )
        assert 0 < ap <= 1


def test_fitness_weights():
    x = np.array([[0.5, 0.5, 0.6, 0.4]])
    assert fitness(x)[0] == pytest.approx(0.1 * 0.6 + 0.9 * 0.4)


class TestConfusionMatrix:
    def test_correct_and_background(self):
        cm = ConfusionMatrix(nc=2)
        labels = np.array([[0, 10, 10, 50, 50]], float)
        dets = np.array(
            [[10, 10, 50, 50, 0.9, 0], [200, 200, 240, 240, 0.8, 1]], float
        )
        cm.process_batch(dets, labels)
        assert cm.matrix[0, 0] == 1  # TP class 0
        assert cm.matrix[1, 2] == 1  # class-1 det on background -> FP
        tp, fp = cm.tp_fp()
        assert tp[0] == 1 and fp[1] == 1

    def test_missed_gt(self):
        cm = ConfusionMatrix(nc=2)
        labels = np.array([[1, 10, 10, 50, 50]], float)
        cm.process_batch(np.zeros((0, 6)), labels)
        assert cm.matrix[2, 1] == 1  # background FN


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou_np(a, b)[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-6)
    assert iou[2] == 0
