"""Image resize on TPU with cv2/PIL-compatible sampling conventions.

Replaces cv2.resize INTER_AREA / INTER_LINEAR / INTER_NEAREST
(matting_refine.py:113-123, color_simplify.py:613-614) and PIL
Image.NEAREST (rembg_infer.py:36-43).

TPU-first design: a resize is expressed as two small dense matmuls
out = W_y @ img @ W_x^T with host-precomputed weight matrices (cached per
(src, dst, method)). This turns arbitrary-weight resampling (including exact
INTER_AREA box overlap) into MXU work with static shapes — no gathers, no
data-dependent control flow, trivially shardable along the batch/channel axes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

AREA = "area"          # cv2 INTER_AREA (exact for downscale)
LINEAR = "linear"      # cv2 INTER_LINEAR (half-pixel centers)
NEAREST_CV = "nearest_cv"    # cv2 INTER_NEAREST (floor(x*scale))
NEAREST_PIL = "nearest_pil"  # PIL Image.NEAREST (floor((x+0.5)*scale))
BILINEAR_PIL = "bilinear_pil"  # PIL BILINEAR (antialiased triangle filter)
LANCZOS_PIL = "lanczos_pil"    # PIL LANCZOS (a=3), used by rembg resizes


def _pil_filter_row(dst: int, src: int, support: float, f) -> np.ndarray:
    """PIL Resample.c precompute_coeffs: antialiased filter weights."""
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    filterscale = max(scale, 1.0)
    sup = support * filterscale
    ss = 1.0 / filterscale
    for d in range(dst):
        center = (d + 0.5) * scale
        xmin = max(0, int(center - sup + 0.5))
        xmax = min(src, int(center + sup + 0.5))
        ws = np.array([f((x - center + 0.5) * ss) for x in range(xmin, xmax)])
        tot = ws.sum()
        if tot != 0:
            w[d, xmin:xmax] = ws / tot
    return w.astype(np.float32)


def _triangle(x: float) -> float:
    x = abs(x)
    return 1.0 - x if x < 1.0 else 0.0


def _lanczos3(x: float) -> float:
    if x == 0.0:
        return 1.0
    if abs(x) >= 3.0:
        return 0.0
    px = np.pi * x
    return 3.0 * np.sin(px) * np.sin(px / 3.0) / (px * px)


@functools.lru_cache(maxsize=None)
def _weights(src: int, dst: int, method: str) -> np.ndarray:
    """(dst, src) row-stochastic resampling weight matrix."""
    w = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    if method == AREA:
        for d in range(dst):
            lo, hi = d * scale, (d + 1) * scale
            s0, s1 = int(np.floor(lo)), int(np.ceil(hi))
            for s in range(s0, min(s1, src)):
                overlap = min(hi, s + 1) - max(lo, s)
                if overlap > 0:
                    w[d, s] = overlap / scale
    elif method == LINEAR:
        for d in range(dst):
            x = (d + 0.5) * scale - 0.5
            x0 = int(np.floor(x))
            f = x - x0
            a = np.clip(x0, 0, src - 1)
            b = np.clip(x0 + 1, 0, src - 1)
            w[d, a] += 1.0 - f
            w[d, b] += f
    elif method == BILINEAR_PIL:
        return _pil_filter_row(dst, src, 1.0, _triangle)
    elif method == LANCZOS_PIL:
        return _pil_filter_row(dst, src, 3.0, _lanczos3)
    elif method == NEAREST_CV:
        for d in range(dst):
            s = min(int(d * scale), src - 1)
            w[d, s] = 1.0
    elif method == NEAREST_PIL:
        # PIL's ImagingTransformAffine accumulates the source coordinate
        # incrementally (xin += scale) instead of multiplying per pixel, so
        # the float64 rounding drift must be simulated to match it exactly.
        xin = scale * 0.5
        for d in range(dst):
            w[d, min(int(xin), src - 1)] = 1.0
            xin += scale
    else:
        raise ValueError(f"unknown resize method: {method}")
    return w


def resize(img: jnp.ndarray, dst_hw: tuple, method: str = LINEAR) -> jnp.ndarray:
    """Resize (H, W) or (H, W, C) float/uint8 image to dst_hw=(H', W').

    Returns float32; use resize_u8 for uint8-in/uint8-out with cv2 rounding.
    """
    h, w = img.shape[:2]
    dh, dw = int(dst_hw[0]), int(dst_hw[1])
    x = img.astype(jnp.float32)
    if (h, w) == (dh, dw):
        return x
    wy = jnp.asarray(_weights(h, dh, method))
    wx = jnp.asarray(_weights(w, dw, method))
    # (dh, h) @ (h, w[, c]) over axis 0, then contract w with (dw, w)
    x = jnp.tensordot(wy, x, axes=([1], [0]))        # (dh, w[, c])
    x = jnp.tensordot(wx, x, axes=([1], [1]))        # (dw, dh[, c])
    x = jnp.moveaxis(x, 0, 1)                        # (dh, dw[, c])
    return x


def resize_u8(img: jnp.ndarray, dst_hw: tuple, method: str = LINEAR) -> jnp.ndarray:
    """uint8 resize with cv2-style round-half-up output conversion."""
    x = resize(img, dst_hw, method)
    return jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)


def scale_to_max_dim(h: int, w: int, max_dim: int) -> tuple:
    """The reference's shrink rule: scale = min(max_dim/h, max_dim/w).

    (matting_refine.py:110-111, color_simplify.py:611-612). Returns (new_h,
    new_w) via int() truncation exactly as the reference computes them.
    """
    scale = min(max_dim / h, max_dim / w)
    # clamp: int() truncation yields a 0-sized dim for aspect ratios beyond
    # max_dim:1 (e.g. an 8x4096 strip at max_dim 256), which would crash
    # every downstream solver; the reference never clamps but also never
    # reaches this (its inputs are photos), so >= 1 only changes inputs the
    # reference cannot process at all.
    return max(1, int(h * scale)), max(1, int(w * scale))
