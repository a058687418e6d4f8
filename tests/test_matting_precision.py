"""Precision routing for closed-form matting on quantized-flat inputs.

The reference always solves in f64 (pymatting, matting_refine.py:9,147).
Our hot path is f32 on TPU — sufficient for photographic inputs, but
exactly-quantized images (posterized / already color-simplified) make the
Laplacian's color boundary windows exactly rank-deficient: the f32 operator
is materially ridge-biased and rtol=1e-5 leaves near-null alpha modes
unpinned, so a certified f32 answer still deviates ~0.975 IoU from
pymatting. estimate_alpha_cf detects that class structurally
(rank_deficient_fraction) and routes to the f64/rtol=1e-7 solve on the host
CPU, restoring reference-precision output.
"""

import numpy as np
import pytest

from helpers.corpus import load_corpus
from helpers.matting_oracle import solve_alpha_reference


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


@pytest.fixture(scope="module")
def quantized_case():
    import cv2 as cv

    rgb = dict(load_corpus(size=256, limit=3))["working_image"]
    a0 = np.where(rgb.mean(-1) > 40, 255, 0).astype(np.uint8)
    a0 = cv.GaussianBlur(a0, (0, 0), 2.0)
    return rgb, a0


def test_rank_deficiency_statistic_separates(quantized_case):
    """The routing statistic: high on the quantized working image, ~0 on a
    real photo with the same trimap construction."""
    import jax.numpy as jnp
    from image_segmenter_tpu.compat.matting_refine import (
        build_trimap_from_alpha_and_strokes)
    from image_segmenter_tpu.solvers.matting import rank_deficient_fraction

    rgb, a0 = quantized_case
    tri = build_trimap_from_alpha_and_strokes(rgb, a0, None)
    frac_q = float(rank_deficient_fraction(
        jnp.asarray(rgb, jnp.float32) / 255.0, jnp.asarray(tri, jnp.float32)))
    assert frac_q > 0.2, frac_q

    import cv2 as cv

    photo = dict(load_corpus(size=256, limit=3))["china"]
    p0 = np.where(photo.mean(-1) > 40, 255, 0).astype(np.uint8)
    p0 = cv.GaussianBlur(p0, (0, 0), 2.0)
    tri_p = build_trimap_from_alpha_and_strokes(photo, p0, None)
    frac_p = float(rank_deficient_fraction(
        jnp.asarray(photo, jnp.float32) / 255.0,
        jnp.asarray(tri_p, jnp.float32)))
    assert frac_p < 0.05, frac_p


def test_quantized_flat_image_matches_f64_oracle(quantized_case):
    """End-to-end ladder on the reference's own (already-quantized) working
    image: must produce a soft CG matte (not the binarize fallback) matching
    the explicit f64 sparse solve to IoU >= 0.99 — the input class that f32
    CG alone cannot certify."""
    from image_segmenter_tpu.compat.matting_refine import (
        build_trimap_from_alpha_and_strokes, refine_alpha_portrait_small)

    rgb, a0 = quantized_case
    out = refine_alpha_portrait_small(rgb, a0, None)
    assert len(np.unique(out)) > 2  # CG path, not the morphological fallback

    tri = build_trimap_from_alpha_and_strokes(rgb, a0, None)
    ref = solve_alpha_reference(rgb.astype(np.float64) / 255.0, tri)
    refu8 = (ref * 255 + 0.5).astype(np.uint8)
    iou = _iou(out > 127, refu8 > 127)
    assert iou >= 0.99, iou


def test_x64_solver_matches_oracle_directly(quantized_case):
    """estimate_alpha_cf(x64=True) == the independent scipy f64 direct solve
    on the same operator, to tight tolerance (both resolve the near-null
    modes at rtol=1e-7)."""
    from image_segmenter_tpu.compat.matting_refine import (
        build_trimap_from_alpha_and_strokes)
    from image_segmenter_tpu.solvers.matting import estimate_alpha_cf

    rgb, a0 = quantized_case
    tri = build_trimap_from_alpha_and_strokes(rgb, a0, None)
    rgbf = rgb.astype(np.float64) / 255.0
    alpha = estimate_alpha_cf(rgbf, tri, x64=True)
    ref = solve_alpha_reference(rgbf, tri)
    assert _iou(alpha > 0.5, ref > 0.5) >= 0.995
    assert float(np.abs(alpha - ref).mean()) < 2e-3
