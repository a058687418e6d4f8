"""compat.color_simplify behavior vs reference semantics (numpy/sklearn/PIL oracles)."""

import numpy as np
import pytest
from PIL import Image

from processing.color_simplify import (
    simplify_colors_kmeans,
    simplify_colors_threshold,
    simplify_colors_hsv_clustering,
    simplify_colors_perceptual_fast,
    simplify_colors_custom_palette,
    simplify_colors_median_cut,
    simplify_colors_octree,
    simplify_colors_adaptive,
    get_color_statistics,
    create_palette_from_colors,
    check_gpu_availability,
    get_recommended_algorithm,
)


def test_kmeans_basic(sample_rgba):
    out, palette = simplify_colors_kmeans(sample_rgba, 5)
    assert out.shape == sample_rgba.shape and out.dtype == np.uint8
    assert palette.dtype == np.uint8 and palette.shape[1] == 3
    # alpha preserved
    np.testing.assert_array_equal(out[..., 3], sample_rgba[..., 3])
    # transparent pixels have zero RGB
    tr = sample_rgba[..., 3] == 0
    assert (out[tr][:, :3] == 0).all()
    # every non-transparent output color is in palette or black (filtered)
    nt_colors = {tuple(c) for c in out[~tr][:, :3].reshape(-1, 3)}
    allowed = {tuple(c) for c in palette} | {(0, 0, 0)}
    assert nt_colors <= allowed
    # the four bright construction colors should be recovered approximately
    construction = np.array([[200, 40, 40], [40, 180, 60], [50, 60, 210], [230, 220, 90]])
    for c in construction:
        d = np.linalg.norm(palette.astype(int) - c, axis=1).min()
        assert d < 30, (c, palette)


def test_kmeans_validates():
    with pytest.raises(ValueError):
        simplify_colors_kmeans(np.zeros((4, 4, 3), np.uint8))


def test_kmeans_all_transparent():
    rgba = np.zeros((8, 8, 4), np.uint8)
    out, palette = simplify_colors_kmeans(rgba, 4)
    np.testing.assert_array_equal(out, rgba)
    np.testing.assert_array_equal(palette, [[0, 0, 0]])


def test_kmeans_single_color():
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., :3] = [100, 150, 200]
    rgba[..., 3] = 255
    out, palette = simplify_colors_kmeans(rgba, 4)
    np.testing.assert_array_equal(out, rgba)
    np.testing.assert_array_equal(palette, [[0, 0, 0]])


def test_kmeans_alpha_binarize(sample_rgba):
    img = sample_rgba.copy()
    img[0:5, :, 3] = 100  # semi-transparent strip
    out, _ = simplify_colors_kmeans(img, 4, preserve_alpha=False)
    expect = (img[..., 3] > 128).astype(np.uint8) * 255
    np.testing.assert_array_equal(out[..., 3], expect)


def test_threshold_exact(sample_rgba):
    out, palette = simplify_colors_threshold(sample_rgba, 8)
    levels = int(np.ceil(np.cbrt(8)))
    step = 256 // levels
    ref_rgb = (sample_rgba[..., :3] // step) * step
    np.testing.assert_array_equal(out[..., :3], ref_rgb)
    np.testing.assert_array_equal(out[..., 3], sample_rgba[..., 3])
    # palette = first num_colors of unique quantized colors (np.unique order)
    ref_palette = np.unique(ref_rgb.reshape(-1, 3), axis=0)[:8]
    np.testing.assert_array_equal(palette, ref_palette)


def test_hsv_clustering(sample_rgba):
    out, palette = simplify_colors_hsv_clustering(sample_rgba, 5)
    assert out.shape == sample_rgba.shape
    tr = sample_rgba[..., 3] == 0
    assert (out[tr][:, :3] == 0).all()
    nt_colors = {tuple(c) for c in out[~tr][:, :3].reshape(-1, 3)}
    assert nt_colors <= {tuple(c) for c in palette}
    assert len(palette) <= 5


def test_perceptual_fast(sample_rgba):
    out, palette = simplify_colors_perceptual_fast(sample_rgba, 5)
    assert out.shape == sample_rgba.shape
    assert len(palette) <= 5
    tr = sample_rgba[..., 3] == 0
    nt_colors = {tuple(c) for c in out[~tr][:, :3].reshape(-1, 3)}
    assert nt_colors <= {tuple(c) for c in palette}


@pytest.mark.parametrize("metric", ["rgb", "lab", "hsv"])
def test_custom_palette(sample_rgba, metric):
    palette = np.array([[200, 40, 40], [40, 180, 60], [50, 60, 210], [0, 0, 0]], np.uint8)
    out, pal = simplify_colors_custom_palette(sample_rgba, palette, True, metric)
    np.testing.assert_array_equal(pal, palette)
    tr = sample_rgba[..., 3] == 0
    nt_colors = {tuple(c) for c in out[~tr][:, :3].reshape(-1, 3)}
    assert nt_colors <= {tuple(c) for c in palette}
    if metric == "rgb":
        # exact nearest-neighbor oracle in RGB
        px = sample_rgba[~tr][:, :3].astype(np.float64)
        d = np.linalg.norm(px[:, None] - palette[None].astype(np.float64), axis=-1)
        ref = palette[d.argmin(1)]
        got = out[~tr][:, :3]
        # ties may break differently; demand near-total agreement
        assert (ref == got).all(axis=1).mean() > 0.999


def test_median_cut_vs_pil(sample_photo):
    rgba = np.dstack([sample_photo, np.full(sample_photo.shape[:2], 255, np.uint8)])
    out, palette = simplify_colors_median_cut(rgba, 8)
    assert len(palette) == 8
    # distinct output colors bounded by palette size
    assert len(np.unique(out[..., :3].reshape(-1, 3), axis=0)) <= 8
    # quantization error within 1.4x of PIL MEDIANCUT
    pil_q = np.array(
        Image.fromarray(sample_photo).quantize(colors=8, method=Image.Quantize.MEDIANCUT).convert("RGB")
    )
    err_ours = ((out[..., :3].astype(np.float64) - sample_photo) ** 2).mean()
    err_pil = ((pil_q.astype(np.float64) - sample_photo) ** 2).mean()
    assert err_ours <= err_pil * 1.4, (err_ours, err_pil)


def test_octree_is_median_cut(sample_photo):
    rgba = np.dstack([sample_photo, np.full(sample_photo.shape[:2], 255, np.uint8)])
    out_o, pal_o = simplify_colors_octree(rgba, 6)
    assert len(pal_o) == 6


def test_statistics(sample_rgba):
    stats = get_color_statistics(sample_rgba)
    flat = sample_rgba.reshape(-1, 4)
    assert stats["total_unique_colors"] == len(np.unique(flat, axis=0))
    nt = sample_rgba[..., 3] > 0
    assert stats["non_transparent_pixels"] == nt.sum()
    np.testing.assert_allclose(
        stats["rgb_mean"], sample_rgba[nt][:, :3].mean(axis=0), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        stats["rgb_std"], sample_rgba[nt][:, :3].std(axis=0), rtol=1e-4, atol=1e-3
    )
    assert stats["image_size"] == sample_rgba.shape[:2]


def test_palette_helpers():
    pal = create_palette_from_colors([(1, 2, 3), (4, 5, 6)])
    assert pal.dtype == np.uint8 and pal.shape == (2, 3)
    info = check_gpu_availability()
    assert set(info) >= {"cupy_available", "pytorch_available", "cuda_available",
                         "gpu_count", "gpu_names"}
    assert get_recommended_algorithm((2000, 1000)) == "perceptual_fast"
    assert get_recommended_algorithm((2000, 1000), True) == "perceptual"
    assert get_recommended_algorithm((700, 800)) == "perceptual_fast"
    assert get_recommended_algorithm((300, 400)) == "hsv_clustering"
    assert get_recommended_algorithm((100, 100)) == "kmeans"


def test_adaptive_dispatch_threshold():
    # few colors -> threshold branch
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[..., :3] = [64, 128, 192]
    rgba[:8, :, :3] = [200, 10, 10]
    rgba[..., 3] = 255
    out, palette = simplify_colors_adaptive(rgba, 8, True, "adaptive")
    assert out.shape == rgba.shape
