"""Gaussian/bilateral smoothers vs cv2 replications of the reference logic."""

import cv2 as cv
import numpy as np
import pytest

from processing.region_cleanup import smooth_region_boundaries


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(3)
    img = np.zeros((48, 64, 4), np.uint8)
    img[..., 3] = 255
    img[:, :32, :3] = [200, 40, 40]
    img[:, 32:, :3] = [40, 180, 60]
    pts = rng.integers(0, [48, 64], (20, 2))
    img[pts[:, 0], pts[:, 1], :3] = [10, 10, 200]
    return img


def _gaussian_oracle(rgba, strength):
    """cv2 replication of region_cleanup.py:914-977."""
    result = rgba.copy()
    rgb = result[:, :, :3]
    nt = result[:, :, 3] > 0
    k = max(3, int(strength * 6) + 1)
    k += k % 2 == 0
    sigma = strength * 1.0
    sm = rgb.copy()
    for color in np.unique(rgb[nt].reshape(-1, 3), axis=0):
        cm = (np.all(rgb == color, axis=2) & nt).astype(np.uint8) * 255
        sk = cv.getStructuringElement(cv.MORPH_ELLIPSE, (3, 3))
        closed = cv.morphologyEx(cm, cv.MORPH_CLOSE, sk)
        bm = cv.GaussianBlur(closed, (k, k), sigma)
        tmp = np.zeros_like(rgb)
        tmp[cm > 0] = color
        bt = cv.GaussianBlur(tmp, (k, k), sigma)
        mn = bm.astype(np.float32) / 255.0
        strong = mn > 0.3
        for c in range(3):
            sm[strong, c] = (sm[strong, c] * (1 - mn[strong])
                             + bt[strong, c] * mn[strong]).astype(np.uint8)
    result[:, :, :3] = sm
    return result


@pytest.mark.parametrize("strength", [0.3, 0.5, 0.8])
def test_gaussian_smoother_oracle(img, strength):
    ours = smooth_region_boundaries(img, "gaussian", strength)
    ref = _gaussian_oracle(img, strength)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def _multiscale_oracle(rgba, strength):
    """cv2 replication of region_cleanup.py:980-1040."""
    from processing.region_cleanup import analyze_regions

    result = rgba.copy()
    rgb = result[:, :, :3]
    nt = result[:, :, 3] > 0
    stats = analyze_regions(rgba, min_size_threshold=10)
    regions = stats["all_regions"]
    if not regions:
        return result
    sizes = [r["size"] for r in regions]
    mx, mn = max(sizes), min(sizes)
    large_t = mn + (mx - mn) * 0.7
    med_t = mn + (mx - mn) * 0.3
    smoothed = np.zeros_like(rgba)
    for r in regions:
        tier = 0.3 if r["size"] >= large_t else 0.6 if r["size"] >= med_t else 1.0
        rs = strength * tier
        color = r["color"]
        cm = (np.all(rgb == color, axis=2) & nt).astype(np.uint8) * 255
        if rs > 0.1:
            k = max(1, int(rs * 5) + 1)
            kernel = cv.getStructuringElement(cv.MORPH_ELLIPSE, (k, k))
            sm = cv.morphologyEx(cm, cv.MORPH_OPEN, kernel)
            sm = cv.morphologyEx(sm, cv.MORPH_CLOSE, kernel)
        else:
            sm = cm
        smoothed[sm > 0] = [*color, 255]
    return smoothed


@pytest.mark.parametrize("strength", [0.3, 0.6, 1.0])
def test_multiscale_smoother_oracle(img, strength):
    ours = smooth_region_boundaries(img, "multiscale", strength)
    ref = _multiscale_oracle(img, strength)
    np.testing.assert_array_equal(ours, ref)


def test_bilateral_filter_close_to_cv2(img):
    """The bilateral core approximates cv2.bilateralFilter (same Gaussian
    space/color model; cv2 uses LUT quantization), then snaps to palette —
    final output must stay within the original palette either way."""
    strength = 0.4
    ours = smooth_region_boundaries(img, "bilateral", strength)
    nt = img[..., 3] > 0
    palette = {tuple(c) for c in np.unique(img[nt][:, :3].reshape(-1, 3), axis=0)}
    got = {tuple(c) for c in np.unique(ours[nt][:, :3].reshape(-1, 3), axis=0)}
    assert got <= palette

    # pre-snap filter parity on the raw RGB
    import jax.numpy as jnp
    from image_segmenter_tpu.compat._smoothing import _bilateral_core

    d = max(1, int(strength * 9) + 1)
    sc = max(1, int(strength * 75) + 1)
    rgb = img[..., :3]
    ours_f = np.asarray(_bilateral_core(jnp.asarray(rgb), jnp.float32(sc),
                                        jnp.float32(sc), d))
    ref_f = cv.bilateralFilter(rgb, d, sc, sc)
    diff = np.abs(ours_f.astype(int) - ref_f.astype(int))
    # cv2 quantizes color weights through a LUT; agreement within a few steps
    assert np.percentile(diff, 95) <= 4, np.percentile(diff, 95)
