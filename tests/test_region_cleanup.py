"""region_cleanup compat API vs cv2/numpy oracles and reference semantics."""

import cv2 as cv
import numpy as np
import pytest

from processing.region_cleanup import (
    analyze_regions,
    find_neighboring_colors,
    find_neighboring_colors_for_component,
    calculate_merge_score,
    color_distance,
    merge_small_regions,
    get_component_bounding_box,
    get_region_boundaries,
    smooth_region_boundaries,
)


@pytest.fixture(scope="module")
def speckled():
    """Large flat regions with small specks that must merge into them."""
    img = np.zeros((64, 96, 4), np.uint8)
    img[..., 3] = 255
    img[:, :48, :3] = [200, 40, 40]
    img[:, 48:, :3] = [40, 180, 60]
    # small specks (sizes 1, 4, 9)
    img[10, 10, :3] = [10, 10, 200]
    img[30:32, 20:22, :3] = [250, 250, 20]
    img[50:53, 70:73, :3] = [10, 10, 200]
    return img


def test_analyze_regions_counts(speckled):
    stats = analyze_regions(speckled, min_size_threshold=100)
    # 2 big + 3 specks
    assert stats["total_regions"] == 5
    assert stats["small_regions"] == 3
    sizes = sorted(stats["region_sizes"])
    assert sizes[:3] == [1, 4, 9]
    assert stats["largest_region_size"] == max(stats["region_sizes"])
    assert stats["smallest_region_size"] == 1
    assert sum(stats["size_distribution"].values()) == 5
    # per-region structure matches reference keys
    r = stats["all_regions"][0]
    assert set(r) == {"color", "size", "label", "color_mask", "labels",
                      "component_id", "bbox"}
    assert (r["labels"] == r["component_id"]).sum() == r["size"]


def test_analyze_regions_empty():
    rgba = np.zeros((8, 8, 4), np.uint8)
    stats = analyze_regions(rgba)
    assert stats["total_regions"] == 0
    assert stats["all_regions"] == []


def test_neighboring_colors(speckled):
    # the blue speck at (10,10) is surrounded by red
    cols = find_neighboring_colors(speckled, (10, 10, 200), connectivity=8)
    assert (200, 40, 40) in cols and (40, 180, 60) in cols  # both specks' neighbors
    mask = np.zeros(speckled.shape[:2], bool)
    mask[10, 10] = True
    cols = find_neighboring_colors_for_component(speckled, mask, connectivity=8)
    assert cols == [(200, 40, 40)]


def test_color_distance_matches_cv2():
    for c1, c2 in [((255, 0, 0), (0, 0, 255)), ((10, 20, 30), (10, 20, 30)),
                   ((200, 40, 40), (40, 180, 60)), ((0, 0, 0), (255, 255, 255))]:
        lab1 = cv.cvtColor(np.array([[c1]], np.uint8), cv.COLOR_RGB2LAB)[0, 0].astype(np.float64)
        lab2 = cv.cvtColor(np.array([[c2]], np.uint8), cv.COLOR_RGB2LAB)[0, 0].astype(np.float64)
        ref = min(1.0, max(0.0, np.linalg.norm(lab1 - lab2) / (255.0 * np.sqrt(3))))
        ours = color_distance(c1, c2)
        assert abs(ours - ref) < 0.02, (c1, c2, ours, ref)


def test_merge_score_formula():
    region = {"color": (200, 40, 40)}
    ctx = {"total_pixels": 1000, "max_region_size": 500,
           "color_counts": {(40, 180, 60): 400}}
    s = calculate_merge_score(region, (40, 180, 60), 400, ctx)
    cs = 1.0 - color_distance((200, 40, 40), (40, 180, 60))
    expect = 0.4 * cs + 0.3 * 0.5 + 0.2 * min(1.0, 400 / 100.0) + 0.1 * min(1.0, 400 / 500)
    assert abs(s - expect) < 1e-9


def test_merge_small_regions_removes_specks(speckled):
    out = merge_small_regions(speckled, min_size=100)
    assert out.shape == speckled.shape
    stats = analyze_regions(out, min_size_threshold=100)
    assert stats["small_regions"] == 0
    # specks adopted their surrounding color
    assert tuple(out[10, 10, :3]) == (200, 40, 40)
    assert tuple(out[51, 71, :3]) == (40, 180, 60)
    # large regions untouched
    assert tuple(out[5, 5, :3]) == (200, 40, 40)
    assert tuple(out[5, 90, :3]) == (40, 180, 60)


def test_merge_progress_callback(speckled):
    calls = []
    merge_small_regions(speckled, 100,
                        progress_callback=lambda c, t, m: calls.append((c, t, m)))
    assert calls[0][1] == 100 and calls[-1][0] == 100
    assert any("Pass" in m for _, _, m in calls)


def test_merge_interactive_callback(speckled):
    """Low-confidence merges consult the callback; None cancels."""
    img = speckled.copy()
    img[20:22, 47:49, :3] = [10, 10, 200]  # straddles red/green border
    out = merge_small_regions(img, 100, merge_callback=lambda *a: None,
                              auto_merge_threshold=1.01)
    # the 2-neighbor speck asks the callback; None cancels the whole op
    assert out is None

    # a callback that picks the first neighbor completes the merge
    def pick_first(target, neighbors, result, bbox):
        return neighbors[0]

    out = merge_small_regions(img, 100, merge_callback=pick_first,
                              auto_merge_threshold=1.01)
    assert out is not None
    assert analyze_regions(out, 100)["small_regions"] == 0


def test_bounding_box():
    mask = np.zeros((50, 60), bool)
    mask[10:14, 20:25] = True
    assert get_component_bounding_box(mask, buffer=0) == (20, 10, 5, 4)
    assert get_component_bounding_box(mask, buffer=10) == (10, 0, 25, 24)
    assert get_component_bounding_box(np.zeros((5, 5), bool)) is None


def test_region_boundaries(speckled):
    out = get_region_boundaries(speckled)
    assert out.shape == (64, 96, 4)
    # boundary pixels are white-on-transparent
    b = out[..., 3] > 0
    assert b.any()
    assert (out[b][:, :3] == 255).all()
    # the vertical color border at x=47/48 must appear
    assert b[:, 46:50].any(axis=1).mean() > 0.9
    # empty input -> zeros
    np.testing.assert_array_equal(
        get_region_boundaries(np.zeros((8, 8, 4), np.uint8)),
        np.zeros((8, 8, 4), np.uint8))


@pytest.mark.parametrize("method", ["morphological", "bilateral", "contour",
                                    "gaussian", "multiscale"])
def test_smoothers_run(speckled, method):
    out = smooth_region_boundaries(speckled, method=method, strength=0.5)
    assert out.shape == speckled.shape and out.dtype == np.uint8


def test_smoother_unknown_method(speckled):
    with pytest.raises(ValueError):
        smooth_region_boundaries(speckled, method="nope")


def test_morphological_smoothing_oracle(speckled):
    """Parity with the reference algorithm re-implemented over cv2."""
    ours = smooth_region_boundaries(speckled, "morphological", 0.5)

    ref = speckled.copy()
    rgb, alpha = ref[..., :3], ref[..., 3]
    nt = alpha > 0
    ks = max(1, int(0.5 * 4) + 1)
    kernel = cv.getStructuringElement(cv.MORPH_ELLIPSE, (ks, ks))
    temp = np.zeros_like(ref)
    for color in np.unique(rgb[nt].reshape(-1, 3), axis=0):
        cmask = (np.all(rgb == color, axis=2) & nt).astype(np.uint8) * 255
        opened = cv.morphologyEx(cmask, cv.MORPH_OPEN, kernel)
        closed = cv.morphologyEx(opened, cv.MORPH_CLOSE, kernel)
        temp[closed > 0] = [*color, 255]
    m = temp[..., 3] > 0
    ref[m] = temp[m]
    np.testing.assert_array_equal(ours, ref)


def test_bilateral_smoothing_palette(speckled):
    out = smooth_region_boundaries(speckled, "bilateral", 0.4)
    nt = speckled[..., 3] > 0
    palette = {tuple(c) for c in np.unique(speckled[nt][:, :3].reshape(-1, 3), axis=0)}
    got = {tuple(c) for c in np.unique(out[nt][:, :3].reshape(-1, 3), axis=0)}
    assert got <= palette  # preserve_colors snaps to original palette


def test_contour_smoothing_fills_regions(speckled):
    out = smooth_region_boundaries(speckled, "contour", 0.3)
    # big regions survive roughly in place
    assert tuple(out[5, 5, :3]) == (200, 40, 40)
    assert tuple(out[30, 80, :3]) == (40, 180, 60)


def test_merge_negative_weights_never_invents_colors():
    """User-supplied negative merge_weights make every event score negative;
    the reference still merges into the argmax-score neighbor
    (region_cleanup.py:460-468 sorts descending and takes the head
    regardless of sign). A review-found regression painted such components
    with the color-table padding sentinel (a color absent from the image)."""
    from processing.region_cleanup import merge_small_regions

    rng = np.random.default_rng(4)
    img = np.zeros((24, 24, 4), np.uint8)
    img[..., 3] = 255
    img[..., :3] = [40, 90, 160]
    img[4:7, 4:7, :3] = [200, 40, 40]      # small region, multiple neighbors
    img[10:12, 10:14, :3] = [30, 180, 80]  # another small region
    in_colors = {tuple(c) for c in img[..., :3].reshape(-1, 3)}

    out = merge_small_regions(
        img, 100, None, 0.7,
        {"color": -0.4, "spatial": -0.3, "frequency": -0.2, "size": -0.1},
        None, 8)
    out_colors = {tuple(c) for c in out[..., :3].reshape(-1, 3)}
    assert out_colors <= in_colors, out_colors - in_colors
    # the small regions did merge away
    assert (out[..., :3] == [40, 90, 160]).all(axis=-1).mean() > 0.95
