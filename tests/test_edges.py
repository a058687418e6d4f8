"""Canny edge detector: bit-parity against cv2.Canny.

The reference's third boundary fallback is cv2.Canny(gray, 5, 15)
(reference app/processing/region_cleanup.py:728-739); ops/edges.py
reimplements OpenCV's exact pipeline (replicate-border Sobel, fixed-point
sector NMS with per-sector strictness, hysteresis by reachability).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from image_segmenter_tpu.ops.edges import canny  # noqa: E402


def _cases(rng):
    rect = np.zeros((64, 80), np.uint8)
    rect[20:40, 25:55] = 200
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    waves = np.clip(127 + 100 * np.sin(xx / 9) * np.cos(yy / 7), 0, 255
                    ).astype(np.uint8)
    noise = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    smooth = cv2.GaussianBlur(noise, (7, 7), 2)
    flat = np.full((32, 32), 77, np.uint8)
    return {"rect": rect, "waves": waves, "noise": noise, "smooth": smooth,
            "flat": flat}


@pytest.mark.parametrize("lo,hi", [(5, 15), (50, 150), (15, 5), (100, 200)])
def test_canny_bit_parity(lo, hi):
    rng = np.random.default_rng(0)
    for name, g in _cases(rng).items():
        ref = cv2.Canny(g, lo, hi)
        ours = canny(g, lo, hi)
        np.testing.assert_array_equal(ours, ref, err_msg=f"{name} ({lo},{hi})")


def test_canny_working_image():
    from PIL import Image
    import os

    path = "/root/reference/app/working_image_cleaned.bmp"
    if not os.path.exists(path):
        pytest.skip("reference asset unavailable")
    g = np.array(Image.open(path).convert("L"))
    ref = cv2.Canny(g, 5, 15)
    ours = canny(g, 5, 15)
    np.testing.assert_array_equal(ours, ref)


def test_boundaries_ladder_flat_image():
    """A flat opaque image exhausts fallback 1 (zero gradient); fallback 2
    (per-region boundary) yields the image-border ring for the single
    full-frame component — same as the reference's contour of the full
    rectangle — so Canny (fallback 3) stays, correctly, unreached."""
    from processing.region_cleanup import get_region_boundaries

    rgba = np.zeros((24, 24, 4), np.uint8)
    rgba[..., :3] = 90
    rgba[..., 3] = 255
    out = get_region_boundaries(rgba)
    assert out.shape == (24, 24, 4)
    ring = np.zeros((24, 24), bool)
    ring[0, :] = ring[-1, :] = ring[:, 0] = ring[:, -1] = True
    np.testing.assert_array_equal(out[..., 3] > 0, ring)


def test_region_cleanup_canny_branch_matches_cv2():
    """The b3 expression inside _boundaries_core is exactly ops/edges canny
    of the cv-weighted gray plane, masked to opaque pixels."""
    from image_segmenter_tpu.ops import color as C
    from image_segmenter_tpu.ops.edges import canny
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (48, 56, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    gray = np.asarray(C.rgb_u8_to_gray_cv(jnp.asarray(rgba[..., :3])))
    ref = cv2.Canny(gray, 5, 15)
    ours = canny(gray, 5, 15)
    np.testing.assert_array_equal(ours, ref)
