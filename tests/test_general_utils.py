"""Timeout / check_img_size / check_dataset validators."""

import time

import pytest

from ecs_yolo_tpu.utils.general import Timeout, check_img_size, check_dataset


def test_timeout_suppresses():
    t0 = time.time()
    with Timeout(1, timeout_msg="too slow"):
        time.sleep(3)
    assert time.time() - t0 < 2.5


def test_check_img_size():
    assert check_img_size(640) == 640
    assert check_img_size(641) == 640
    assert check_img_size(100, 32) == 96


def test_check_dataset_validates():
    good = dict(nc=2, train="x", names=["a", "b"])
    assert check_dataset(good) is good
    with pytest.raises(AssertionError):
        check_dataset(dict(nc=3, train="x", names=["a"]))
    with pytest.raises(AssertionError):
        check_dataset(dict(names=["a"]))
