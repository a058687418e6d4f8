"""Canny edge detection — TPU-native, cv2.Canny bit-parity.

The reference's third boundary-extraction fallback is
cv2.Canny(gray, 5, 15) (reference app/processing/region_cleanup.py:728-739).
This reimplements OpenCV's exact pipeline (aperture 3, L1 gradient) as
vectorized XLA: replicate-padded Sobel, fixed-point sector quantization for
non-maximum suppression (OpenCV's 2^15-scaled tan(22.5) arithmetic, with its
exact strict/non-strict neighbor comparisons), and hysteresis expressed as
connected-component reachability (label the >low NMS survivors, keep
components containing a >high pixel) instead of OpenCV's pointer stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_segmenter_tpu.ops import connected_components as CCOMP

_CANNY_SHIFT = 15
_TG22 = 13573  # round(tan(22.5 deg) * 2^15), OpenCV's constant


def _sobel_pair(gray: jnp.ndarray):
    """Aperture-3 Sobel dx/dy, int32. cv2.Canny invokes Sobel with
    BORDER_REPLICATE (unlike standalone cv2.Sobel's reflect-101 default)."""
    g = gray.astype(jnp.int32)
    p = jnp.pad(g, 1, mode="edge")
    h, w = gray.shape

    def sl(dy, dx):
        return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    gx = (sl(-1, 1) + 2 * sl(0, 1) + sl(1, 1)
          - sl(-1, -1) - 2 * sl(0, -1) - sl(1, -1))
    gy = (sl(1, -1) + 2 * sl(1, 0) + sl(1, 1)
          - sl(-1, -1) - 2 * sl(-1, 0) - sl(-1, 1))
    return gx, gy


def _nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """OpenCV's sector-quantized non-maximum suppression.

    Keep pixel m when it strictly beats the 'previous' neighbor and ties or
    beats the 'next' neighbor along the quantized gradient direction;
    out-of-image magnitudes are 0 (OpenCV zero-pads its row buffers).
    """
    h, w = mag.shape
    mp = jnp.pad(mag, 1, constant_values=0)

    def sl(dy, dx):
        return mp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    x = jnp.abs(gx)
    y = jnp.abs(gy) << _CANNY_SHIFT
    tg22x = x * _TG22
    tg67x = tg22x + (x << (_CANNY_SHIFT + 1))

    horiz = y < tg22x
    vert = y > tg67x
    # diagonal sector: sign(gx) == sign(gy) -> 135 deg, opposite -> 45 deg
    s_neg = (gx ^ gy) < 0
    diag_prev = jnp.where(s_neg, sl(-1, 1), sl(-1, -1))
    diag_next = jnp.where(s_neg, sl(1, -1), sl(1, 1))

    prev_m = jnp.where(horiz, sl(0, -1), jnp.where(vert, sl(-1, 0), diag_prev))
    next_m = jnp.where(horiz, sl(0, 1), jnp.where(vert, sl(1, 0), diag_next))
    # empirically matched against cv2 5.0 (tests/test_edges.py): the axis
    # sectors compare (strict prev, non-strict next); the diagonal sector is
    # strict against BOTH neighbors
    axis_keep = (mag > prev_m) & (mag >= next_m)
    diag_keep = (mag > prev_m) & (mag > next_m)
    return jnp.where(horiz | vert, axis_keep, diag_keep)


@functools.partial(jax.jit, static_argnames=("l2gradient",))
def canny_core(gray: jnp.ndarray, low: float, high: float,
               l2gradient: bool = False) -> jnp.ndarray:
    gx, gy = _sobel_pair(gray)
    if l2gradient:
        mag2 = gx * gx + gy * gy
        # OpenCV squares the thresholds in L2 mode; keep ints exact
        mag = mag2
        lo = jnp.int32(low) * jnp.int32(low)
        hi = jnp.int32(high) * jnp.int32(high)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)
        lo, hi = jnp.int32(low), jnp.int32(high)

    keep = _nms(mag, gx, gy)
    cand = keep & (mag > lo)
    strong = cand & (mag > hi)

    # hysteresis: candidates 8-connected to a strong pixel survive
    labels = CCOMP.label_components(jnp.zeros_like(gray, jnp.int32), cand, 8)
    h, w = gray.shape
    flat = jnp.where(cand.reshape(-1), labels.reshape(-1), 0)
    seed = jnp.zeros(h * w, jnp.int32).at[flat].max(
        strong.reshape(-1).astype(jnp.int32))
    edge = cand & (seed[labels.reshape(-1)].reshape(h, w) > 0)
    return edge.astype(jnp.uint8) * 255


def canny(gray, threshold1: float, threshold2: float,
          l2gradient: bool = False):
    """cv2.Canny-compatible entry: uint8 gray in, {0,255} uint8 out."""
    import numpy as np

    lo, hi = sorted((float(threshold1), float(threshold2)))
    out = canny_core(jnp.asarray(gray), lo, hi, l2gradient=l2gradient)
    return np.asarray(out)
