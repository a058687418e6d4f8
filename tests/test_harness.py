"""Harness-surface behaviors: morphological fine-tuning + algorithm comparison."""

import cv2 as cv
import numpy as np
import pytest

from image_segmenter_tpu.compat.harness import (
    apply_custom_morphological_smoothing,
    compare_smoothing_algorithms,
)


def _oracle_finetune(rgba, kernel_size, kernel_shape, operation, strength):
    """cv2 replication of test_smoothing_algorithms.py:874-929."""
    result = rgba.copy()
    rgb = result[:, :, :3]
    alpha = result[:, :, 3]
    nt = alpha > 0
    if not nt.any():
        return result
    shape = {"Ellipse": cv.MORPH_ELLIPSE, "Rectangle": cv.MORPH_RECT,
             "Cross": cv.MORPH_CROSS}[kernel_shape]
    kernel = cv.getStructuringElement(shape, (kernel_size, kernel_size))
    temp = np.zeros_like(rgba)
    for color in np.unique(rgb[nt].reshape(-1, 3), axis=0):
        cm = (np.all(rgb == color, axis=2) & nt).astype(np.uint8) * 255
        if operation == "Open then Close":
            p = cv.morphologyEx(cv.morphologyEx(cm, cv.MORPH_OPEN, kernel),
                                cv.MORPH_CLOSE, kernel)
        elif operation == "Close then Open":
            p = cv.morphologyEx(cv.morphologyEx(cm, cv.MORPH_CLOSE, kernel),
                                cv.MORPH_OPEN, kernel)
        elif operation == "Open only":
            p = cv.morphologyEx(cm, cv.MORPH_OPEN, kernel)
        else:
            p = cv.morphologyEx(cm, cv.MORPH_CLOSE, kernel)
        p = cv.addWeighted(cm, 1.0 - strength, p, strength, 0)
        temp[p > 0] = [*color, 255]
    m = temp[:, :, 3] > 0
    result[m] = temp[m]
    return result


@pytest.fixture(scope="module")
def quantized(rng):
    img = np.zeros((48, 64, 4), np.uint8)
    img[..., 3] = 255
    img[:, :32, :3] = [200, 40, 40]
    img[:, 32:, :3] = [40, 180, 60]
    pts = rng.integers(0, [48, 64], size=(30, 2))
    img[pts[:, 0], pts[:, 1], :3] = [10, 10, 200]
    img[2:6, 2:8, 3] = 0
    return img


@pytest.mark.parametrize("shape", ["Ellipse", "Rectangle", "Cross"])
@pytest.mark.parametrize("op", ["Open then Close", "Close then Open",
                                "Open only", "Close only"])
def test_finetune_matches_cv2_full_strength(quantized, shape, op):
    ours = apply_custom_morphological_smoothing(quantized, 3, shape, op, 1.0)
    ref = _oracle_finetune(quantized, 3, shape, op, 1.0)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("strength", [0.0, 0.5, 1.0])
def test_finetune_strength_blend(quantized, strength):
    ours = apply_custom_morphological_smoothing(quantized, 5, "Ellipse",
                                                "Open then Close", strength)
    ref = _oracle_finetune(quantized, 5, "Ellipse", "Open then Close", strength)
    np.testing.assert_array_equal(ours, ref)


def test_compare_smoothing_algorithms(quantized):
    results = compare_smoothing_algorithms(quantized, 0.5)
    assert set(results) == {"morphological", "bilateral", "contour",
                            "gaussian", "multiscale"}
    for name, (out, secs) in results.items():
        assert out.shape == quantized.shape and out.dtype == np.uint8
        assert secs >= 0.0
