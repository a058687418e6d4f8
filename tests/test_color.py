"""Color-space conversion parity vs cv2 (and analytic LAB reference)."""

import cv2 as cv
import numpy as np
import jax.numpy as jnp

from image_segmenter_tpu.ops import color


def test_lab_roundtrip(sample_photo):
    lab = color.srgb_to_lab(jnp.asarray(sample_photo, jnp.float32) / 255.0)
    back = np.asarray(color.lab_to_rgb_u8(lab))
    assert np.max(np.abs(back.astype(int) - sample_photo.astype(int))) <= 1


def test_lab_known_values():
    # Analytic anchors for skimage-convention rgb2lab (D65, 2-deg observer).
    rgb = jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    lab = np.asarray(color.srgb_to_lab(rgb))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.02)
    # sRGB red: L*=53.24, a*=80.09, b*=67.20 (standard published values)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.05)


def test_lab_cv_parity(sample_photo):
    ours = np.asarray(color.rgb_u8_to_lab_cv(jnp.asarray(sample_photo)))
    ours_u8 = np.clip(np.round(ours), 0, 255).astype(np.uint8)
    ref = cv.cvtColor(sample_photo, cv.COLOR_RGB2LAB)
    # cv2 uses fixed-point tables without sRGB gamma differences resolved the
    # same way; allow small absolute deviation.
    diff = np.abs(ours_u8.astype(int) - ref.astype(int))
    assert np.percentile(diff, 99) <= 2
    assert diff.max() <= 4


def test_hsv_cv_parity(sample_photo):
    ours = np.asarray(color.rgb_u8_to_hsv_cv(jnp.asarray(sample_photo)))
    ours_u8 = np.clip(np.round(ours), 0, 255).astype(np.uint8)
    ref = cv.cvtColor(sample_photo, cv.COLOR_RGB2HSV)
    diff = np.abs(ours_u8.astype(int) - ref.astype(int))
    # H wraps at 180
    diff[..., 0] = np.minimum(diff[..., 0], 180 - diff[..., 0])
    assert diff.max() <= 1


def test_hsv_roundtrip(sample_photo):
    hsv = color.rgb_u8_to_hsv_cv(jnp.asarray(sample_photo))
    back = np.asarray(color.hsv_cv_to_rgb_u8(hsv))
    assert np.max(np.abs(back.astype(int) - sample_photo.astype(int))) <= 1


def test_gray_cv_parity(sample_photo):
    ours = np.asarray(color.rgb_u8_to_gray_cv(jnp.asarray(sample_photo)))
    ref = cv.cvtColor(sample_photo, cv.COLOR_RGB2GRAY)
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1


def test_pack_unpack(sample_photo):
    packed = color.pack_rgb_u32(jnp.asarray(sample_photo))
    ref = (
        (sample_photo[..., 0].astype(np.uint32) << 16)
        | (sample_photo[..., 1].astype(np.uint32) << 8)
        | sample_photo[..., 2].astype(np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(packed), ref)
    back = np.asarray(color.unpack_rgb_u32(packed))
    np.testing.assert_array_equal(back, sample_photo)
