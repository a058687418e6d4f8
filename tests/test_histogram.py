"""Histogram / Otsu parity vs cv2."""

import cv2 as cv
import numpy as np
import jax.numpy as jnp

from image_segmenter_tpu.ops import histogram as hg


def test_histogram(rng):
    x = rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
    ours = np.asarray(hg.histogram_u8(jnp.asarray(x)))
    ref = np.bincount(x.ravel(), minlength=256).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_otsu_parity(rng):
    # Bimodal alpha-like image (the rembg sharp-edges use case).
    a = rng.normal(40, 15, size=2000)
    b = rng.normal(200, 20, size=3000)
    x = np.clip(np.concatenate([a, b]), 0, 255).astype(np.uint8).reshape(50, 100)
    t_ref, bin_ref = cv.threshold(x, 0, 255, cv.THRESH_BINARY + cv.THRESH_OTSU)
    t_ours = float(np.asarray(hg.otsu_threshold(jnp.asarray(x))))
    assert abs(t_ours - t_ref) <= 1
    bin_ours = np.asarray(hg.otsu_binarize(jnp.asarray(x)))
    assert (bin_ours != bin_ref).mean() < 0.01


def test_otsu_parity_uniform(rng):
    x = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    t_ref, _ = cv.threshold(x, 0, 255, cv.THRESH_BINARY + cv.THRESH_OTSU)
    t_ours = float(np.asarray(hg.otsu_threshold(jnp.asarray(x))))
    assert abs(t_ours - t_ref) <= 1
