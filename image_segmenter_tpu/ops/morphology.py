"""Morphology on TPU: erode/dilate/open/close/gradient with cv2 semantics.

Replaces the reference's OpenCV C++ morphology (region_cleanup.py:163,698,
816-818, 947-950, 1032-1033; rembg_infer.py:88-90; matting_refine.py:73-75).

Design notes (TPU-first):
- Binary masks use XLA convolution with the structuring element as the kernel:
  dilation = conv(mask, se) > 0, erosion = conv(mask, se) == sum(se). XLA lowers
  these to MXU/VPU-friendly ops and fuses the compare; arbitrary SE shapes
  (ellipse/cross) cost the same as rect.
- Grayscale morphology (only the 3x3 morphological gradient in the reference)
  unrolls the SE offsets into a max/min tree of shifted reads, which XLA fuses
  into one VPU pass.
- Border semantics match cv2 defaults: erosion pads with 1 (border never
  shrinks the mask), dilation pads with 0.

Structuring elements replicate cv2.getStructuringElement rasterization
(MORPH_RECT / MORPH_ELLIPSE / MORPH_CROSS) exactly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Structuring elements (host-side, static)
# --------------------------------------------------------------------------

RECT = "rect"
ELLIPSE = "ellipse"
CROSS = "cross"


@functools.lru_cache(maxsize=None)
def structuring_element(shape: str, ksize: tuple) -> np.ndarray:
    """cv2.getStructuringElement-compatible binary SE of shape (kh, kw)."""
    kw, kh = int(ksize[0]), int(ksize[1])  # cv2 takes (width, height)
    se = np.zeros((kh, kw), dtype=np.uint8)
    if shape == RECT:
        se[:] = 1
    elif shape == CROSS:
        se[kh // 2, :] = 1
        se[:, kw // 2] = 1
    elif shape == ELLIPSE:
        # Mirror of cv2's rasterization (modules/imgproc/src/morph.cpp).
        r, c = kh // 2, kw // 2
        inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
        for i in range(kh):
            dy = i - r
            if abs(dy) <= r:
                if r > 0:
                    dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
                else:
                    dx = c
                j1 = max(c - dx, 0)
                j2 = min(c + dx + 1, kw)
                se[i, j1:j2] = 1
    else:
        raise ValueError(f"unknown SE shape: {shape}")
    return se


def _conv2d_same(x: jnp.ndarray, kernel: np.ndarray, pad_value: float) -> jnp.ndarray:
    """2D cross-correlation with SAME padding and a constant border value.

    x: (H, W) float32. kernel: (kh, kw) numpy. Returns (H, W) float32.
    """
    kh, kw = kernel.shape
    ph0, ph1 = kh // 2, kh - 1 - kh // 2
    pw0, pw1 = kw // 2, kw - 1 - kw // 2
    xp = jnp.pad(x, ((ph0, ph1), (pw0, pw1)), constant_values=pad_value)
    k = jnp.asarray(kernel, dtype=jnp.float32)
    out = jax.lax.conv_general_dilated(
        xp[None, None],
        k[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


# --------------------------------------------------------------------------
# Binary morphology (mask in {0,1} or bool)
# --------------------------------------------------------------------------

_SHIFT_TREE_MAX = 26  # SEs with <= this many taps use shifts, not convs


def _shift_reduce(mask_b: jnp.ndarray, se: np.ndarray,
                  is_dilate: bool) -> jnp.ndarray:
    """Max/min over SE taps as a fused shift tree (faster than NCHW convs on
    TPU for the 3x3/5x5 kernels the reference uses everywhere).

    cv2 reads src(p + k - anchor) for BOTH erode and dilate (no kernel flip;
    verified empirically with asymmetric even SEs), anchor = ksize // 2.
    """
    kh, kw = se.shape
    cy, cx = kh // 2, kw // 2
    fill = not is_dilate  # dilate: outside=0; erode: outside=1 (cv2 borders)
    h, w = mask_b.shape
    pad_y = max(cy, kh - 1 - cy)
    pad_x = max(cx, kw - 1 - cx)
    mp = jnp.pad(mask_b, ((pad_y, pad_y), (pad_x, pad_x)), constant_values=fill)
    out = None
    for i in range(kh):
        for j in range(kw):
            if not se[i, j]:
                continue
            dy, dx = i - cy, j - cx
            s = mp[pad_y + dy : pad_y + dy + h, pad_x + dx : pad_x + dx + w]
            if out is None:
                out = s
            else:
                out = (out | s) if is_dilate else (out & s)
    return out


def dilate_binary(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation; matches cv2.dilate on a {0,255} mask (border=0)."""
    m = mask > 0
    if se.sum() <= _SHIFT_TREE_MAX:
        for _ in range(int(iterations)):
            m = _shift_reduce(m, se, is_dilate=True)
        return m
    k = se.astype(np.float32)
    mf = m.astype(jnp.float32)
    for _ in range(int(iterations)):
        mf = (_conv2d_same(mf, k, 0.0) > 0.5).astype(jnp.float32)
    return mf.astype(jnp.bool_)


def erode_binary(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion; matches cv2.erode on a {0,255} mask (border=max)."""
    m = mask > 0
    if se.sum() <= _SHIFT_TREE_MAX:
        for _ in range(int(iterations)):
            m = _shift_reduce(m, se, is_dilate=False)
        return m
    k = se.astype(np.float32)
    total = float(k.sum())
    mf = m.astype(jnp.float32)
    for _ in range(int(iterations)):
        mf = (_conv2d_same(mf, k, 1.0) > total - 0.5).astype(jnp.float32)
    return mf.astype(jnp.bool_)


def open_binary(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return dilate_binary(erode_binary(mask, se), se)


def close_binary(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return erode_binary(dilate_binary(mask, se), se)


# --------------------------------------------------------------------------
# Grayscale morphology (unrolled shift trees; small SEs only in reference)
# --------------------------------------------------------------------------

def _shifted(x: jnp.ndarray, dy: int, dx: int, fill: float) -> jnp.ndarray:
    """x shifted so output[y, x] = input[y+dy, x+dx], constant fill outside."""
    h, w = x.shape
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    xp = jnp.pad(x, pad, constant_values=fill)
    return jax.lax.dynamic_slice(xp, (max(dy, 0), max(dx, 0)), (h, w))


def dilate_gray(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """Grayscale dilation (max over SE), cv2 border semantics (min fill).

    cv2 reads src(p + k - anchor) for dilate as well as erode (no flip)."""
    x = img.astype(jnp.float32)
    kh, kw = se.shape
    cy, cx = kh // 2, kw // 2
    out = None
    for i in range(kh):
        for j in range(kw):
            if se[i, j]:
                s = _shifted(x, i - cy, j - cx, float("-inf"))
                out = s if out is None else jnp.maximum(out, s)
    return out


def erode_gray(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """Grayscale erosion (min over SE), cv2 border semantics (max fill)."""
    x = img.astype(jnp.float32)
    kh, kw = se.shape
    cy, cx = kh // 2, kw // 2
    out = None
    for i in range(kh):
        for j in range(kw):
            if se[i, j]:
                s = _shifted(x, i - cy, j - cx, float("inf"))
                out = s if out is None else jnp.minimum(out, s)
    return out


def morphological_gradient(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """cv2 MORPH_GRADIENT: dilate - erode (region_cleanup.py:698)."""
    x = img.astype(jnp.float32)
    return jnp.clip(dilate_gray(x, se) - erode_gray(x, se), 0.0, 255.0)


# --------------------------------------------------------------------------
# Gaussian blur (separable), cv2.GaussianBlur semantics
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel: if sigma<=0, sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W) or (H, W, C) float image.

    Border: reflect-101 (cv2 default BORDER_REFLECT_101).
    """
    k = gaussian_kernel_1d(int(ksize), float(sigma))
    r = (len(k) - 1) // 2
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, ((r, r), (0, 0), (0, 0)), mode="reflect")
    kcol = jnp.asarray(k)[:, None, None]
    x = sum(xp[i : i + x.shape[0]] * kcol[i] for i in range(len(k)))
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="reflect")
    x = sum(xp[:, i : i + x.shape[1]] * kcol[i] for i in range(len(k)))
    return x[..., 0] if squeeze else x


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window with zero padding, via two cumsum passes.

    O(HW) independent of radius — the workhorse behind the matting Laplacian
    matvec (solvers/matting.py). Accepts (H, W) or (H, W, C).
    """
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    r = int(radius)

    def _axis_sum(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = a.shape[axis]
        c = jnp.cumsum(a, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        cpad = jnp.concatenate([zero, c], axis=axis)  # cpad[i] = sum of first i
        hi = jnp.clip(jnp.arange(n) + r + 1, 0, n)
        lo = jnp.clip(jnp.arange(n) - r, 0, n)
        return jnp.take(cpad, hi, axis=axis) - jnp.take(cpad, lo, axis=axis)

    x = _axis_sum(x, 0)
    x = _axis_sum(x, 1)
    return x[..., 0] if squeeze else x
