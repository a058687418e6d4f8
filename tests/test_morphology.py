"""Morphology / blur / box-filter parity vs cv2."""

import cv2 as cv
import numpy as np
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.ops import morphology as m


@pytest.mark.parametrize("shape,cvshape", [
    (m.RECT, cv.MORPH_RECT),
    (m.ELLIPSE, cv.MORPH_ELLIPSE),
    (m.CROSS, cv.MORPH_CROSS),
])
@pytest.mark.parametrize("ksize", [(3, 3), (5, 5), (7, 7), (5, 3), (9, 9), (25, 25)])
def test_structuring_elements(shape, cvshape, ksize):
    ours = m.structuring_element(shape, ksize)
    ref = cv.getStructuringElement(cvshape, ksize)
    np.testing.assert_array_equal(ours, ref)


def _binary_mask(rng, h=64, w=80):
    mask = (rng.random((h, w)) > 0.6).astype(np.uint8) * 255
    mask[20:40, 25:55] = 255
    return mask


@pytest.mark.parametrize("shape", [m.RECT, m.ELLIPSE, m.CROSS])
@pytest.mark.parametrize("ksize", [(3, 3), (5, 5)])
def test_binary_dilate_erode(rng, shape, ksize):
    mask = _binary_mask(rng)
    se = m.structuring_element(shape, ksize)
    ours_d = np.asarray(m.dilate_binary(jnp.asarray(mask), se)).astype(np.uint8) * 255
    ref_d = cv.dilate(mask, se)
    np.testing.assert_array_equal(ours_d, ref_d)
    ours_e = np.asarray(m.erode_binary(jnp.asarray(mask), se)).astype(np.uint8) * 255
    ref_e = cv.erode(mask, se)
    np.testing.assert_array_equal(ours_e, ref_e)


def test_binary_open_close(rng):
    mask = _binary_mask(rng)
    se = m.structuring_element(m.ELLIPSE, (3, 3))
    ours_o = np.asarray(m.open_binary(jnp.asarray(mask), se)).astype(np.uint8) * 255
    ref_o = cv.morphologyEx(mask, cv.MORPH_OPEN, se)
    np.testing.assert_array_equal(ours_o, ref_o)
    ours_c = np.asarray(m.close_binary(jnp.asarray(mask), se)).astype(np.uint8) * 255
    ref_c = cv.morphologyEx(mask, cv.MORPH_CLOSE, se)
    np.testing.assert_array_equal(ours_c, ref_c)


def test_morphological_gradient(sample_photo):
    gray = cv.cvtColor(sample_photo, cv.COLOR_RGB2GRAY)
    se = m.structuring_element(m.ELLIPSE, (3, 3))
    ours = np.asarray(m.morphological_gradient(jnp.asarray(gray), se)).astype(np.uint8)
    ref = cv.morphologyEx(gray, cv.MORPH_GRADIENT, se)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize,sigma", [(3, 0.5), (5, 1.0), (7, 0)])
def test_gaussian_blur(sample_photo, ksize, sigma):
    ours = np.asarray(m.gaussian_blur(jnp.asarray(sample_photo), ksize, sigma))
    ours_u8 = np.clip(np.floor(ours + 0.5), 0, 255).astype(np.uint8)
    ref = cv.GaussianBlur(sample_photo, (ksize, ksize), sigma)
    assert np.max(np.abs(ours_u8.astype(int) - ref.astype(int))) <= 1


@pytest.mark.parametrize("radius", [1, 2, 7])
def test_box_filter(rng, radius):
    x = rng.random((33, 47)).astype(np.float32)
    ours = np.asarray(m.box_filter(jnp.asarray(x), radius))
    k = 2 * radius + 1
    ref = cv.boxFilter(x, -1, (k, k), normalize=False, borderType=cv.BORDER_CONSTANT)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)
