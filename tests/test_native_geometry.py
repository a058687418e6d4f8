"""Native C++ geometry engine vs the pure-Python reference path."""

import numpy as np
import pytest

from image_segmenter_tpu.ops import contours as CONT
from image_segmenter_tpu.ops import native as NAT


pytestmark = pytest.mark.skipif(NAT.get_lib() is None,
                                reason="no C++ toolchain available")


def _python_contours(mask):
    """Force the Python implementation (bypass native dispatch)."""
    import unittest.mock as mock

    with mock.patch.object(NAT, "trace_contours", lambda m: None):
        return CONT.external_contours(mask)


def test_trace_matches_python(rng):
    mask = np.zeros((48, 64), np.uint8)
    mask[5:20, 8:30] = 1
    mask[25:40, 40:60] = 1
    mask[30, 10] = 1  # isolated pixel
    mask[10:12, 40:56] = 1
    nat = NAT.trace_contours(mask)
    py = _python_contours(mask)
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(a, b)


def test_trace_random(rng):
    for _ in range(3):
        mask = (rng.random((40, 52)) > 0.6).astype(np.uint8)
        nat = NAT.trace_contours(mask)
        py = _python_contours(mask)
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(a, b)


def test_dp_matches_python(rng):
    mask = np.zeros((64, 64), np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    mask[((yy - 32) ** 2 + (xx - 32) ** 2) < 24 ** 2] = 1
    (cont,) = _python_contours(mask)
    for eps in [0.5, 2.0, 5.0]:
        nat = NAT.approx_poly_dp(cont, eps)
        import unittest.mock as mock

        with mock.patch.object(NAT, "approx_poly_dp", lambda p, e: None):
            py = CONT.approx_poly_dp(cont, eps, closed=True)
        np.testing.assert_array_equal(nat, py)


def test_fill_matches_python():
    pts = np.array([[5, 5], [40, 8], [35, 30], [10, 28]], np.int32)
    m_nat = np.zeros((40, 50), np.uint8)
    assert NAT.fill_polygon(m_nat, pts)
    m_py = np.zeros((40, 50), bool)
    import unittest.mock as mock

    with mock.patch.object(NAT, "fill_polygon", lambda m, p: False):
        CONT.fill_polygon(m_py, pts)
    np.testing.assert_array_equal(m_nat > 0, m_py)


def test_contour_smoothing_uses_native(speckled_like=None):
    from processing.region_cleanup import smooth_region_boundaries

    img = np.zeros((64, 96, 4), np.uint8)
    img[..., 3] = 255
    img[:, :48, :3] = [200, 40, 40]
    img[:, 48:, :3] = [40, 180, 60]
    out = smooth_region_boundaries(img, "contour", 0.3)
    assert tuple(out[5, 5, :3]) == (200, 40, 40)
    assert tuple(out[30, 80, :3]) == (40, 180, 60)


def test_native_cc_matches_device_kernel():
    """Union-find CC (native/geometry.cpp ig_label_components) must be
    bit-identical to the TPU label-propagation kernel: same raster-first
    root labels, sizes, and bboxes, for 4- and 8-connectivity."""
    import cv2 as cv
    import jax.numpy as jnp
    from image_segmenter_tpu.ops import native as NAT
    from image_segmenter_tpu.ops.connected_components import component_stats

    rng = np.random.default_rng(7)
    for conn in (4, 8):
        cid = cv.medianBlur(
            rng.integers(0, 6, (90, 130)).astype(np.uint8), 5).astype(np.int32)
        valid = rng.random((90, 130)) > 0.15
        res = NAT.label_components_host(cid, valid, conn)
        if res is None:
            import pytest

            pytest.skip("native library unavailable")
        lab_n, sz_n, bb_n = res
        lab_d, sz_d, bb_d = (np.asarray(x) for x in component_stats(
            jnp.asarray(cid), jnp.asarray(valid), conn))
        np.testing.assert_array_equal(lab_n, lab_d)
        np.testing.assert_array_equal(sz_n, sz_d)
        np.testing.assert_array_equal(bb_n, bb_d)
