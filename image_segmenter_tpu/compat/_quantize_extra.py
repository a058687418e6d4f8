"""Median-cut / perceptual (Ward) / DBSCAN quantizers — second batch.

Median-cut replaces PIL's Image.quantize(method=MEDIANCUT) used by both
"median_cut" AND "octree" in the reference (color_simplify.py:145 and :201 —
the reference's octree is literally median-cut). The TPU does the heavy
lifting (unique-color histogram, final pixel mapping via binary search);
the box-split loop runs on <=65536 unique colors.

Not PIL-bit-exact: PIL's C implementation has its own split heuristics; this
is classical Heckbert median-cut (split the most-populated box along its
longest axis at the weighted median). tests/test_quantize.py asserts the
quantization error is within tolerance of PIL's.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.ops import unique as U

_CAP = 1 << 16


def _validate_rgba(rgba: np.ndarray) -> None:
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")


@jax.jit
def _all_unique(rgba: jnp.ndarray):
    packed = C.pack_rgb_u32(rgba[..., :3]).reshape(-1)
    return U.packed_unique(packed, jnp.ones(packed.shape, jnp.bool_), cap=_CAP)


def _median_cut_boxes(colors: np.ndarray, counts: np.ndarray, k: int) -> np.ndarray:
    """Heckbert median cut on unique colors. Returns box label per color."""
    n = len(colors)
    labels = np.zeros(n, dtype=np.int32)
    boxes = {0: np.arange(n)}
    next_label = 1
    while len(boxes) < k:
        # Split the box with the largest pixel population that is splittable.
        order = sorted(boxes, key=lambda b: -counts[boxes[b]].sum())
        split_done = False
        for b in order:
            idx = boxes[b]
            if len(idx) < 2:
                continue
            sub = colors[idx].astype(np.int32)
            widths = sub.max(axis=0) - sub.min(axis=0)
            axis = int(np.argmax(widths))
            if widths[axis] == 0:
                continue
            srt = idx[np.argsort(sub[:, axis], kind="stable")]
            csum = np.cumsum(counts[srt])
            half = csum[-1] / 2.0
            cut = int(np.searchsorted(csum, half)) + 1
            cut = min(max(cut, 1), len(srt) - 1)
            boxes[b] = srt[:cut]
            boxes[next_label] = srt[cut:]
            labels[srt[cut:]] = next_label
            next_label += 1
            split_done = True
            break
        if not split_done:
            break
    # Relabel compactly in box order
    remap = {b: i for i, b in enumerate(sorted(boxes))}
    for b, idx in boxes.items():
        labels[idx] = remap[b]
    return labels, len(boxes)


@jax.jit
def _map_via_unique(rgba: jnp.ndarray, uniq_vals: jnp.ndarray,
                    color_label: jnp.ndarray, palette_u8: jnp.ndarray):
    """Map each pixel to palette[label(its unique color)] via binary search."""
    h, w = rgba.shape[:2]
    packed = C.pack_rgb_u32(rgba[..., :3]).reshape(-1)
    pos = jnp.searchsorted(uniq_vals, packed)
    pos = jnp.clip(pos, 0, uniq_vals.shape[0] - 1)
    lbl = color_label[pos]
    return palette_u8[lbl].reshape(h, w, 3)


def _alpha_out_np(alpha: np.ndarray, preserve: bool) -> np.ndarray:
    return alpha if preserve else ((alpha > 128).astype(np.uint8) * 255)


def _median_cut_impl(rgba: np.ndarray, num_colors: int, preserve_alpha: bool,
                     pow2: bool) -> Tuple[np.ndarray, np.ndarray]:
    _validate_rgba(rgba)
    if pow2:
        # reference rounds DOWN to a power of two (color_simplify.py:131)
        num_colors = 2 ** int(np.log2(num_colors))
    x = jnp.asarray(rgba)
    vals, counts, n_unique = _all_unique(x)
    n_unique = int(n_unique)
    vals_np = np.asarray(vals)
    counts_np = np.asarray(counts)
    colors = np.asarray(C.unpack_rgb_u32(vals[:n_unique] if n_unique < _CAP else vals))
    colors = colors[:n_unique]
    counts_np = counts_np[:n_unique]

    k = min(num_colors, max(n_unique, 1))
    labels, n_boxes = _median_cut_boxes(colors, counts_np, k)

    # Palette: weighted mean per box
    palette = np.zeros((num_colors, 3), dtype=np.float64)
    for b in range(n_boxes):
        m = labels == b
        wsum = counts_np[m].sum()
        palette[b] = (colors[m].astype(np.float64) * counts_np[m, None]).sum(0) / max(wsum, 1)
    palette_u8 = np.clip(np.round(palette), 0, 255).astype(np.uint8)

    full_labels = np.zeros(_CAP, dtype=np.int32)
    full_labels[:n_unique] = labels
    q = np.asarray(_map_via_unique(x, vals, jnp.asarray(full_labels),
                                   jnp.asarray(palette_u8)))
    alpha = _alpha_out_np(rgba[..., 3], preserve_alpha)
    return np.dstack([q, alpha]), palette_u8[:num_colors]


def simplify_colors_median_cut(rgba, num_colors=8, preserve_alpha=True):
    """(reference color_simplify.py:105-164; quantizes ALL pixels, incl.
    transparent ones, exactly like the PIL path does)."""
    return _median_cut_impl(rgba, num_colors, preserve_alpha, pow2=True)


def simplify_colors_octree(rgba, num_colors=8, preserve_alpha=True):
    """The reference's "octree" is PIL MEDIANCUT (color_simplify.py:201),
    without the power-of-two rounding of the median_cut entry point."""
    return _median_cut_impl(rgba, num_colors, preserve_alpha, pow2=False)


def simplify_colors_perceptual(rgba, num_colors=8, preserve_alpha=True,
                               color_tolerance=30.0, use_gpu=False,
                               max_samples=10000):
    from image_segmenter_tpu.compat import _perceptual as P
    return P.simplify_colors_perceptual(rgba, num_colors, preserve_alpha,
                                        color_tolerance, use_gpu, max_samples)


def simplify_colors_adaptive_distance(rgba, num_colors=8, preserve_alpha=True,
                                      similarity_threshold=25.0):
    from image_segmenter_tpu.compat import _perceptual as P
    return P.simplify_colors_adaptive_distance(rgba, num_colors, preserve_alpha,
                                               similarity_threshold)
