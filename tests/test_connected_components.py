"""TPU connected components vs cv2 oracle."""

import cv2 as cv
import numpy as np
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.ops import connected_components as CC


def _labels_equivalent(ours, ref, valid):
    """Partitions must match exactly on valid pixels."""
    o = ours[valid]
    r = ref[valid]
    # bijection check both directions
    for a, b in [(o, r), (r, o)]:
        pairs = {}
        for x, y in zip(a.ravel(), b.ravel()):
            if x in pairs and pairs[x] != y:
                return False
            pairs[x] = y
    return True


@pytest.mark.parametrize("connectivity", [4, 8])
def test_binary_components_match_cv2(rng, connectivity):
    mask = (rng.random((48, 64)) > 0.55).astype(np.uint8)
    n_ref, ref = cv.connectedComponents(mask * 255, connectivity=connectivity)
    ours = np.asarray(CC.label_components(
        jnp.asarray(mask.astype(np.uint32)), jnp.asarray(mask > 0), connectivity))
    valid = mask > 0
    assert _labels_equivalent(ours, ref, valid)
    assert len(np.unique(ours[valid])) == n_ref - 1


@pytest.mark.parametrize("connectivity", [4, 8])
def test_multicolor_components(sample_rgba, connectivity):
    """One labeling pass over all colors == per-color cv2 labeling."""
    rgb = sample_rgba[..., :3]
    alpha = sample_rgba[..., 3]
    nt = alpha > 0
    packed = (rgb[..., 0].astype(np.uint32) << 16) | (rgb[..., 1].astype(np.uint32) << 8) | rgb[..., 2].astype(np.uint32)
    ours = np.asarray(CC.label_components(jnp.asarray(packed), jnp.asarray(nt), connectivity))

    total_ref = 0
    for color in np.unique(rgb[nt].reshape(-1, 3), axis=0):
        cmask = (np.all(rgb == color, axis=2) & nt).astype(np.uint8) * 255
        n, ref = cv.connectedComponentsWithStats(cmask, connectivity=connectivity)[:2]
        total_ref += n - 1
        m = cmask > 0
        assert _labels_equivalent(ours, ref, m)
    assert len(np.unique(ours[nt])) == total_ref


def test_component_stats(sample_rgba):
    rgb = sample_rgba[..., :3]
    nt = sample_rgba[..., 3] > 0
    packed = (rgb[..., 0].astype(np.uint32) << 16) | (rgb[..., 1].astype(np.uint32) << 8) | rgb[..., 2].astype(np.uint32)
    labels, sizes, bbox = CC.component_stats(jnp.asarray(packed), jnp.asarray(nt), 8)
    labels, sizes, bbox = np.asarray(labels), np.asarray(sizes), np.asarray(bbox)
    for r in np.unique(labels[labels >= 0]):
        m = labels == r
        assert sizes[r] == m.sum()
        ys, xs = np.nonzero(m)
        assert tuple(bbox[r]) == (xs.min(), ys.min(), xs.max(), ys.max())


def test_flood_fill_matches_cv2(sample_rgba):
    from processing.region_cleanup import flood_fill_region

    rgba = sample_rgba.copy()
    seed = (40, 30)  # (x, y) in an interior region
    fill = (255, 0, 255)
    ours = flood_fill_region(rgba, seed, fill)

    refrgb = np.ascontiguousarray(rgba[..., :3].copy())
    mask = np.zeros((rgba.shape[0] + 2, rgba.shape[1] + 2), np.uint8)
    cv.floodFill(refrgb, mask, seed, fill, loDiff=(0, 0, 0), upDiff=(0, 0, 0),
                 flags=cv.FLOODFILL_FIXED_RANGE)
    np.testing.assert_array_equal(ours[..., :3], refrgb)


def test_flood_fill_edge_cases(sample_rgba):
    from processing.region_cleanup import flood_fill_region

    out = flood_fill_region(sample_rgba, (-1, 5), (1, 2, 3))
    np.testing.assert_array_equal(out, sample_rgba)
    # transparent seed -> no-op
    ty, tx = 12, 15  # inside the transparent hole
    assert sample_rgba[ty, tx, 3] == 0
    out = flood_fill_region(sample_rgba, (tx, ty), (1, 2, 3))
    np.testing.assert_array_equal(out, sample_rgba)
