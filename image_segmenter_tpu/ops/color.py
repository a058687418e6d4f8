"""Fused sRGB <-> LAB / HSV / gray color-space conversion kernels.

TPU re-implementation of the color conversions the reference delegates to
skimage (rgb2lab/lab2rgb, color_simplify.py:470,681) and OpenCV (RGB2HSV
color_simplify.py:947, RGB2LAB region_cleanup.py:294, RGB2GRAY
region_cleanup.py:694). All functions are elementwise chains that XLA fuses
into a single VPU pass; they accept arrays of shape (..., 3) and are
jit/vmap/shard_map friendly with no data-dependent control flow.

Two LAB variants exist because the reference mixes two libraries with
different conventions:

- `srgb_to_lab` / `lab_to_srgb`: skimage-compatible (sRGB gamma linearization,
  D65 white point, L in [0,100], a/b roughly [-128,127], float).
- `rgb_u8_to_lab_cv`: OpenCV 8-bit compatible (same colorimetry, output scaled
  L*255/100, a+128, b+128 and rounded to uint8) — used by the reference's
  region_cleanup.color_distance (region_cleanup.py:294).
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB -> XYZ matrix (IEC 61966-2-1, D65), rows X/Y/Z.
_RGB2XYZ = jnp.array(
    [
        [0.412456439089692, 0.357576077643909, 0.180437483266399],
        [0.212672851405623, 0.715152155287818, 0.072174993306560],
        [0.019333895582329, 0.119192025881303, 0.950304078536368],
    ],
    dtype=jnp.float32,
)

_XYZ2RGB = jnp.array(
    [
        [3.240454162114103, -1.537138512797715, -0.498531409556016],
        [-0.969266030505187, 1.876010845446694, 0.041556017530349],
        [0.055643430959114, -0.204025913516754, 1.057225188223179],
    ],
    dtype=jnp.float32,
)

# D65 reference white (2-degree observer), as used by skimage.
_D65 = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)

_EPS = 216.0 / 24389.0  # (6/29)^3
_KAPPA = 24389.0 / 27.0  # (29/3)^3


def srgb_linearize(srgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB electro-optical transfer: gamma-encoded [0,1] -> linear [0,1]."""
    srgb = srgb.astype(jnp.float32)
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power((srgb + 0.055) / 1.055, 2.4),
    )


def srgb_delinearize(lin: jnp.ndarray) -> jnp.ndarray:
    """Linear [0,1] -> gamma-encoded sRGB [0,1]."""
    lin = lin.astype(jnp.float32)
    safe = jnp.maximum(lin, 1e-12)
    return jnp.where(
        lin <= 0.0031308,
        lin * 12.92,
        1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055,
    )


def _mat3(v: jnp.ndarray, m) -> jnp.ndarray:
    """Apply a 3x3 matrix to (...,3) via elementwise FMAs.

    Written as VPU elementwise ops rather than a (...,3)@(3,3) matmul: tiny
    matmuls waste the 128x128 MXU and on TPU default-precision f32 matmuls
    round through bf16, which visibly corrupts dark colors after the gamma
    inverse. This form is exact f32 and fuses with the gamma curves.
    """
    c0, c1, c2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            m[0][0] * c0 + m[0][1] * c1 + m[0][2] * c2,
            m[1][0] * c0 + m[1][1] * c1 + m[1][2] * c2,
            m[2][0] * c0 + m[2][1] * c1 + m[2][2] * c2,
        ],
        axis=-1,
    )


def srgb_to_xyz(srgb: jnp.ndarray) -> jnp.ndarray:
    lin = srgb_linearize(srgb)
    return _mat3(lin, _RGB2XYZ)


def xyz_to_srgb(xyz: jnp.ndarray) -> jnp.ndarray:
    lin = _mat3(xyz.astype(jnp.float32), _XYZ2RGB)
    return srgb_delinearize(jnp.clip(lin, 0.0, 1.0))


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > _EPS, jnp.cbrt(t), (_KAPPA * t + 16.0) / 116.0)


def _lab_finv(f: jnp.ndarray) -> jnp.ndarray:
    f3 = f * f * f
    return jnp.where(f3 > _EPS, f3, (116.0 * f - 16.0) / _KAPPA)


def srgb_to_lab(srgb: jnp.ndarray) -> jnp.ndarray:
    """skimage-compatible rgb2lab. Input (...,3) float in [0,1]; output float32.

    L in [0,100]; a/b approximately [-128,127].
    """
    xyz = srgb_to_xyz(srgb) / _D65
    f = _lab_f(xyz)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_srgb(lab: jnp.ndarray) -> jnp.ndarray:
    """skimage-compatible lab2rgb. Output float32 in [0,1] (clipped)."""
    lab = lab.astype(jnp.float32)
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1) * _D65
    return jnp.clip(xyz_to_srgb(xyz), 0.0, 1.0)


def rgb_u8_to_lab(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> skimage-style float LAB."""
    return srgb_to_lab(rgb_u8.astype(jnp.float32) / 255.0)


def lab_to_rgb_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """skimage-style float LAB -> uint8 RGB (round-half-up like np.clip+cast)."""
    srgb = lab_to_srgb(lab)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.uint8)


def rgb_u8_to_lab_cv(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """OpenCV 8-bit COLOR_RGB2LAB-compatible conversion (float32 output).

    OpenCV scales: L <- L*255/100, a <- a+128, b <- b+128, then rounds to u8.
    We return float32 of the scaled values; round+cast to compare with cv2.
    Used by region_cleanup.color_distance parity (region_cleanup.py:294).
    """
    lab = srgb_to_lab(rgb_u8.astype(jnp.float32) / 255.0)
    L = lab[..., 0] * (255.0 / 100.0)
    a = lab[..., 1] + 128.0
    b = lab[..., 2] + 128.0
    return jnp.stack([L, a, b], axis=-1)


def rgb_u8_to_hsv_cv(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """OpenCV 8-bit COLOR_RGB2HSV-compatible conversion -> float32 (...,3).

    H in [0,180) (degrees/2), S and V in [0,255]. Round+cast to uint8 to match
    cv2 exactly up to fixed-point rounding (+-1 in H/S).
    Reference use: color_simplify.py:947, custom palette hsv metric :1097.
    """
    rgb = rgb_u8.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    # Hue in degrees
    h_r = 60.0 * (g - b) / safe_c
    h_g = 120.0 + 60.0 * (b - r) / safe_c
    h_b = 240.0 + 60.0 * (r - g) / safe_c
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # OpenCV stores H/2 for uint8
    s = jnp.where(v == 0, 0.0, 255.0 * c / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv_cv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_u8_to_hsv_cv. hsv float32 (H in [0,180), S/V in [0,255])."""
    h = hsv[..., 0] * 2.0  # degrees
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.clip(hp.astype(jnp.int32), 0, 5)
    r1 = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                    [c, x, z, z, x, c])
    g1 = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                    [x, c, c, x, z, z])
    b1 = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                    [z, z, x, c, c, x])
    m = v - c
    rgb = jnp.stack([r1 + m, g1 + m, b1 + m], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def rgb_u8_to_gray_cv(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """OpenCV COLOR_RGB2GRAY: Y = 0.299 R + 0.587 G + 0.114 B, rounded u8.

    Reference use: region_cleanup.py:694 (boundary extraction).
    """
    rgb = rgb_u8.astype(jnp.float32)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def pack_rgb_u32(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Pack (...,3) uint8 RGB into (...,) uint32 (r<<16 | g<<8 | b).

    Matches the reference's packing in tendril_trimming.py:89 and the
    harness's majority smoother (test_smoothing_algorithms.py:1044).
    """
    r = rgb_u8[..., 0].astype(jnp.uint32)
    g = rgb_u8[..., 1].astype(jnp.uint32)
    b = rgb_u8[..., 2].astype(jnp.uint32)
    return (r << 16) | (g << 8) | b


def unpack_rgb_u32(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_rgb_u32: (...,) uint32 -> (...,3) uint8."""
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
