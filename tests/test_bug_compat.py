"""The bug_compat flag reproduces documented reference bugs bit-for-bit."""

import dataclasses

import numpy as np
import pytest

import image_segmenter_tpu.compat.color_simplify as CS
from image_segmenter_tpu import config


@pytest.fixture
def bug_mode(monkeypatch):
    buggy = dataclasses.replace(config.DEFAULTS, bug_compat=True)
    monkeypatch.setattr(config, "DEFAULTS", buggy)
    monkeypatch.setattr(CS, "DEFAULTS", buggy)
    yield


def test_kmeans_black_output_bug(sample_rgba, bug_mode):
    """color_simplify.py:90 — the chained fancy-index write-back is a no-op,
    so the reference's kmeans output RGB stays black while the palette is
    still correct."""
    out, palette = CS.simplify_colors_kmeans(sample_rgba, 5)
    assert (out[..., :3] == 0).all()
    np.testing.assert_array_equal(out[..., 3], sample_rgba[..., 3])
    assert len(palette) == 5  # palette still computed


def test_kmeans_fixed_by_default(sample_rgba):
    out, _ = CS.simplify_colors_kmeans(sample_rgba, 5)
    nt = sample_rgba[..., 3] > 0
    assert (out[nt][:, :3] != 0).any()


def test_perceptual_bug_compat_mapping(monkeypatch):
    """color_simplify.py:544 compares LAB pixels against RGB centers; the
    flag reproduces that mapping, which differs from the fixed LAB-LAB map."""
    import image_segmenter_tpu.compat._perceptual as P

    rng = np.random.default_rng(0)
    rgba = np.zeros((24, 32, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[..., :3] = rng.integers(0, 256, (24, 32, 3))

    out_fixed, pal_fixed = P.simplify_colors_perceptual(rgba, 4)

    buggy = dataclasses.replace(config.DEFAULTS, bug_compat=True)
    monkeypatch.setattr(P, "DEFAULTS", buggy)
    out_bug, pal_bug = P.simplify_colors_perceptual(rgba, 4)

    np.testing.assert_array_equal(pal_fixed, pal_bug)  # same clustering
    assert (out_fixed != out_bug).any()                 # different mapping
