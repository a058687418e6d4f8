"""256-bin histograms and Otsu thresholding as XLA reductions.

Replaces cv2.threshold(..., THRESH_BINARY + THRESH_OTSU) used for alpha
sharpening (rembg_infer.py:85) and the fixed-threshold binarizations scattered
through the reference. The histogram is a one-hot matmul (MXU) or segment-sum;
the Otsu sweep is a fully vectorized scan over all 256 candidate thresholds.
"""

from __future__ import annotations

import jax.numpy as jnp


def histogram_u8(x: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """256-bin histogram of a uint8 array (any shape). Returns float32 (256,)."""
    flat = x.reshape(-1).astype(jnp.int32)
    w = jnp.ones_like(flat, dtype=jnp.float32) if weights is None else weights.reshape(-1).astype(jnp.float32)
    return jnp.zeros((256,), jnp.float32).at[flat].add(w)


def otsu_threshold(x: jnp.ndarray) -> jnp.ndarray:
    """Otsu's optimal threshold of a uint8 image, cv2-compatible.

    cv2 semantics (modules/imgproc/src/thresh.cpp getThreshValue_Otsu):
    maximize between-class variance sigma_b(t) over t, where class 0 is
    values <= t; ties resolved to the smallest t (cv2 updates on strict >).
    Binarization is then x > t (cv2 THRESH_BINARY).
    Returns the scalar threshold as float32.
    """
    hist = histogram_u8(x)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)                      # count of values <= t
    sum0 = jnp.cumsum(hist * bins)             # sum of values <= t
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = jnp.where(w0 > 0, sum0 / jnp.maximum(w0, 1.0), 0.0)
    mu1 = jnp.where(w1 > 0, (sum_all - sum0) / jnp.maximum(w1, 1.0), 0.0)
    sigma_b = w0 * w1 * (mu0 - mu1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    sigma_b = jnp.where(valid, sigma_b, -1.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)  # argmax takes first max


def otsu_binarize(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.threshold(x, 0, 255, THRESH_BINARY | THRESH_OTSU) -> uint8 {0,255}."""
    t = otsu_threshold(x)
    return jnp.where(x.astype(jnp.float32) > t, 255, 0).astype(jnp.uint8)
