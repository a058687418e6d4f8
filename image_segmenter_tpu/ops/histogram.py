"""256-bin histograms and Otsu thresholding as XLA reductions.

Replaces cv2.threshold(..., THRESH_BINARY + THRESH_OTSU) used for alpha
sharpening (rembg_infer.py:85) and the fixed-threshold binarizations scattered
through the reference. The histogram is a one-hot matmul (MXU) or segment-sum;
the Otsu sweep is a fully vectorized scan over all 256 candidate thresholds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Backend routing lives in utils/backend.py (shared public helper); the
# private alias remains for existing importers.
from image_segmenter_tpu.utils.backend import targets_tpu as _targets_tpu  # noqa: F401


def histogram_u8(x: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """256-bin histogram of a uint8 array (any shape). Returns float32 (256,).

    Unweighted path: a fused compare-reduce — sum over pixels of
    (x == bin) with the (N, 256) one-hot never materialized (XLA fuses the
    broadcast compare into the column reduction). Measured 5.6x faster than
    the sort+searchsorted formulation at 8M elements on v5e
    (bench/micro_hist.py); scatters stay an order slower still. Weighted
    path keeps the scatter (only used on small inputs).
    """
    flat = x.reshape(-1)
    if weights is None:
        if _targets_tpu(flat) and flat.size >= (1 << 18):
            # one-pass Pallas kernel: XLA's compare-reduce makes several
            # full passes over large inputs (kernels/pallas_histogram.py)
            from image_segmenter_tpu.kernels.pallas_histogram import hist256

            return hist256(flat)
        bins = jnp.arange(256, dtype=jnp.int32)
        counts = jnp.sum(flat.astype(jnp.int32)[:, None] == bins[None, :],
                         axis=0, dtype=jnp.int32)
        return counts.astype(jnp.float32)
    w = weights.reshape(-1).astype(jnp.float32)
    return jnp.zeros((256,), jnp.float32).at[flat.astype(jnp.int32)].add(w)


def u8_quantile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile(x, q*100) for uint8 data, from the 256-bin histogram.

    Sort-free: linear interpolation at rank q*(N-1) using histogram cumsum —
    exact for u8 inputs (np.percentile's 'linear' method). Scalar float32.
    """
    hist = histogram_u8(x)
    n = jnp.sum(hist)
    cum = jnp.cumsum(hist)  # cum[v] = # of elements <= v
    rank = q * (n - 1.0)
    lo_r = jnp.floor(rank)
    frac = rank - lo_r
    # value at sorted position p = smallest v with cum[v] > p
    v_lo = jnp.argmax(cum > lo_r)
    v_hi = jnp.argmax(cum > lo_r + 1.0)
    v_hi = jnp.where(cum[-1] > lo_r + 1.0, v_hi, v_lo)
    return v_lo.astype(jnp.float32) + frac * (v_hi - v_lo).astype(jnp.float32)


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
