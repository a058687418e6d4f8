"""perceptual / adaptive_distance quantizers: behavioral contracts."""

import numpy as np

from processing.color_simplify import (
    simplify_colors_perceptual,
    simplify_colors_adaptive_distance,
    simplify_colors_adaptive,
)


def _check_contract(rgba, out, palette, k):
    assert out.shape == rgba.shape and out.dtype == np.uint8
    assert palette.dtype == np.uint8 and palette.shape[1] == 3
    assert len(palette) <= k
    tr = rgba[..., 3] == 0
    assert (out[tr][:, :3] == 0).all()
    nt_colors = {tuple(c) for c in out[~tr][:, :3].reshape(-1, 3)}
    assert nt_colors <= {tuple(c) for c in palette}
    np.testing.assert_array_equal(out[..., 3], rgba[..., 3])


def test_perceptual_contract(sample_rgba):
    # NOTE: the reference clusters UNIQUE colors unweighted (:470-523), so
    # speckle noise colors carry as much weight as large flat regions — no
    # guarantee any particular region color survives into the palette. Only
    # the structural contract is asserted here; semantic quality is covered
    # by test_perceptual_merges_shades.
    out, palette = simplify_colors_perceptual(sample_rgba, 5)
    _check_contract(sample_rgba, out, palette, 5)


def test_perceptual_merges_shades():
    """Light/dark shades of two hues -> k=2 splits by hue, not lightness."""
    rgba = np.zeros((20, 40, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[:10, :20, :3] = [220, 60, 60]   # light red
    rgba[10:, :20, :3] = [160, 40, 40]   # dark red
    rgba[:10, 20:, :3] = [60, 60, 220]   # light blue
    rgba[10:, 20:, :3] = [40, 40, 160]   # dark blue
    out, palette = simplify_colors_perceptual(rgba, 2)
    assert len(palette) == 2
    # left half maps to one palette color, right half to the other
    left = {tuple(c) for c in out[:, :20, :3].reshape(-1, 3)}
    right = {tuple(c) for c in out[:, 20:, :3].reshape(-1, 3)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_perceptual_fallbacks():
    rgba = np.zeros((8, 8, 4), np.uint8)
    out, pal = simplify_colors_perceptual(rgba, 4)
    np.testing.assert_array_equal(pal, [[0, 0, 0]])


def test_adaptive_distance_contract(sample_rgba):
    out, palette = simplify_colors_adaptive_distance(sample_rgba, 6)
    _check_contract(sample_rgba, out, palette, 6)


def test_adaptive_distance_exact_clusters():
    """Distinct flat colors -> clusters == exact colors (DBSCAN trivially
    separates them; multiplicity makes each color a core point)."""
    rgba = np.zeros((30, 30, 4), np.uint8)
    rgba[..., 3] = 255
    cols = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    rgba[:10, :, :3] = cols[0]
    rgba[10:20, :, :3] = cols[1]
    rgba[20:, :, :3] = cols[2]
    out, palette = simplify_colors_adaptive_distance(rgba, 3)
    assert sorted(map(tuple, palette.tolist())) == sorted(cols)
    # image unchanged (each pixel maps to its own cluster color)
    np.testing.assert_array_equal(out, rgba)


def test_adaptive_dispatch_many_colors(sample_photo):
    """>1000 unique colors routes to perceptual (reference :334-336)."""
    rgba = np.dstack([sample_photo, np.full(sample_photo.shape[:2], 255, np.uint8)])
    out, palette = simplify_colors_adaptive(rgba, 6, True, "adaptive")
    _check_contract(rgba, out, palette, 6)
