"""Native C++ kernel tests (skipped gracefully without a toolchain)."""

import numpy as np
import pytest

from ecs_yolo_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native lib unavailable"
)


def test_warp_identity():
    rng = np.random.RandomState(0)
    im = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    out = native.warp_perspective(im, np.eye(3), (32, 48))
    np.testing.assert_array_equal(out, im)


def test_warp_translation_fill():
    im = np.full((16, 16, 3), 200, np.uint8)
    minv = np.eye(3)
    minv[0, 2] = -8.0  # output x -> input x-8: right half from image
    out = native.warp_perspective(im, minv, (16, 16))
    assert (out[:, 8:] == 200).all()
    assert (out[:, :7] == 114).all()


def test_warp_matches_scipy_affine():
    # scipy.ndimage uses the same integer-coordinate convention as
    # cv2.warpAffine (which the reference uses); PIL differs by a
    # half-pixel center offset.
    from scipy import ndimage

    rng = np.random.RandomState(1)
    im = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    ang = 0.3
    minv = np.array(
        [[np.cos(ang), -np.sin(ang), 5.0],
         [np.sin(ang), np.cos(ang), -3.0],
         [0, 0, 1.0]]
    )
    got = native.warp_perspective(im, minv, (40, 40)).astype(float)
    # scipy maps output (row, col) -> input; convert the (x, y) matrix
    m_rc = np.array(
        [[minv[1, 1], minv[1, 0], minv[1, 2]],
         [minv[0, 1], minv[0, 0], minv[0, 2]],
         [0, 0, 1]]
    )
    want = np.stack(
        [
            ndimage.affine_transform(
                im[..., c].astype(float), m_rc[:2, :2], m_rc[:2, 2],
                order=1, mode="constant", cval=114.0,
            )
            for c in range(3)
        ],
        axis=-1,
    )
    diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert np.median(diff) <= 1.0
    assert (diff <= 2).mean() > 0.95


def test_hsv_jitter_identity():
    rng = np.random.RandomState(2)
    im = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    out = native.hsv_jitter(im.copy(), 1.0, 1.0, 1.0)
    assert np.abs(out.astype(int) - im.astype(int)).mean() < 4


def test_paint_events():
    canvas = np.full((24, 30, 3), 127, np.uint8)
    xs = np.array([3, 5, 40], np.int32)  # 40 clamps to 29
    ys = np.array([2, 6, 50], np.int32)
    ps = np.array([1, 0, 1], np.int32)
    native.paint_events(xs, ys, ps, canvas)
    assert (canvas[2, 3] == 255).all()
    assert (canvas[6, 5] == 0).all()
    assert (canvas[23, 29] == 255).all()
