"""Resize parity vs cv2 and PIL."""

import cv2 as cv
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from image_segmenter_tpu.ops import resize as rz


def test_area_downscale_parity(sample_photo):
    dh, dw = 31, 43
    ours = np.asarray(rz.resize_u8(jnp.asarray(sample_photo), (dh, dw), rz.AREA))
    ref = cv.resize(sample_photo, (dw, dh), interpolation=cv.INTER_AREA)
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1


def test_area_integer_downscale(sample_photo):
    h, w = sample_photo.shape[:2]
    ours = np.asarray(rz.resize_u8(jnp.asarray(sample_photo), (h // 4, w // 4), rz.AREA))
    ref = cv.resize(sample_photo, (w // 4, h // 4), interpolation=cv.INTER_AREA)
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1


@pytest.mark.parametrize("dst", [(160, 224), (57, 91)])
def test_linear_parity(sample_photo, dst):
    dh, dw = dst
    ours = np.asarray(rz.resize_u8(jnp.asarray(sample_photo), (dh, dw), rz.LINEAR))
    ref = cv.resize(sample_photo, (dw, dh), interpolation=cv.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # cv2 INTER_LINEAR uses 5-bit fixed-point weights; tolerate small deltas.
    assert np.percentile(diff, 99.9) <= 2
    assert diff.max() <= 3


def test_nearest_cv_parity(sample_photo):
    dh, dw = 45, 67
    ours = np.asarray(rz.resize_u8(jnp.asarray(sample_photo), (dh, dw), rz.NEAREST_CV))
    ref = cv.resize(sample_photo, (dw, dh), interpolation=cv.INTER_NEAREST)
    assert (ours != ref).mean() < 0.02  # cv2 nearest has off-by-one quirks


def test_nearest_pil_parity(sample_rgba):
    dh, dw = 45, 67
    ours = np.asarray(rz.resize_u8(jnp.asarray(sample_rgba), (dh, dw), rz.NEAREST_PIL))
    ref = np.array(Image.fromarray(sample_rgba, "RGBA").resize((dw, dh), Image.NEAREST))
    np.testing.assert_array_equal(ours, ref)


def test_scale_to_max_dim():
    # matting_refine.py:110-111 semantics (only called when a dim > max_dim)
    assert rz.scale_to_max_dim(2048, 1536, 1024) == (1024, 768)
    h, w = rz.scale_to_max_dim(3000, 4000, 1024)
    assert max(h, w) == 1024
