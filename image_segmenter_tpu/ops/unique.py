"""Unique-value extraction on TPU via sort + segment reduction.

The reference calls np.unique on flattened pixel arrays all over
(color_simplify.py:69,363,451,640,984; region_cleanup.py:50,804,881). On TPU
the equivalent is a fixed-shape program: sort the packed color keys, mark
segment boundaries, and scatter values/counts into a static-capacity table.
The true unique count comes back as a scalar so hosts can make the
reference's data-dependent decisions (actual_num_colors = min(k, n_unique))
with a single scalar sync instead of a full-image download.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SENTINEL = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("cap",))
def packed_unique(
    packed: jnp.ndarray,
    valid: jnp.ndarray,
    cap: int,
):
    """Unique values among packed[valid] with counts.

    Args:
      packed: (N,) uint32 keys (e.g. pack_rgb_u32 output). Keys equal to
        SENTINEL (0xFFFFFFFF) are reserved.
      valid: (N,) bool mask.
      cap: static table capacity.

    Returns:
      values: (cap,) uint32, first n_unique entries are the sorted unique
        keys, the rest are SENTINEL. If n_unique > cap, only the smallest
        cap keys are returned.
      counts: (cap,) float32 occurrence counts (aligned with values).
      n_unique: () int32 true number of unique valid keys.
    """
    keys = jnp.where(valid, packed, SENTINEL)
    s = jnp.sort(keys)
    is_valid = s != SENTINEL
    boundary = jnp.concatenate([is_valid[:1], (s[1:] != s[:-1]) & is_valid[1:]])
    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # unique index per elem
    n_unique = jnp.sum(boundary).astype(jnp.int32)
    # Sentinel tail must not inherit the last valid rank (it would inflate
    # that rank's count); push it past every real rank — stays sorted since
    # sentinels sort last.
    seg = jnp.where(is_valid, seg, jnp.int32(1 << 30))
    # Scatter-free extraction: seg is sorted, so the first/last position of
    # rank r falls out of two binary searches — TPU scatters over millions of
    # elements are an order of magnitude slower than these gathers.
    ranks = jnp.arange(cap, dtype=jnp.int32)
    left = jnp.searchsorted(seg, ranks, side="left")
    right = jnp.searchsorted(seg, ranks, side="right")
    in_range = ranks < n_unique
    values = jnp.where(in_range,
                       s[jnp.clip(left, 0, s.shape[0] - 1)], SENTINEL)
    counts = jnp.where(in_range, (right - left).astype(jnp.float32), 0.0)
    return values, counts, n_unique


@functools.partial(jax.jit, static_argnames=("cap",))
def sorted_weighted_sample(packed: jnp.ndarray, valid: jnp.ndarray, cap: int):
    """Systematic weighted sample of the key DISTRIBUTION: (values, weights).

    Sort the keys and take every ceil(N/cap)-th element with weight = stride.
    Because the decimation runs over the SORTED array, each retained key
    represents exactly `stride` order-adjacent originals — a weighted
    quantile sketch of the color distribution, which is all a k-means fit
    consumes. Duplicates in the output are fine (weights add).

    Role: the COVERAGE-EXACT (sort-based) sampler, kept as the accuracy
    baseline for the pipeline's sort-free grid sampler (bench/
    micro_fit_sample.py compares them; the pipeline itself repairs grid
    blind spots branchlessly with fit-mass-ranked index sets instead —
    see pipeline/segment.py, and bench/device_trace.py for why a
    lax.cond fallback was unusable under vmap).
    Invalid slots come back as SENTINEL with weight 0.
    """
    n = packed.shape[0]
    keys = jnp.where(valid, packed, SENTINEL)
    s = jnp.sort(keys)
    stride = max(1, -(-n // cap))
    sub = s[stride // 2::stride][:cap]
    if sub.shape[0] < cap:
        sub = jnp.pad(sub, (0, cap - sub.shape[0]), constant_values=SENTINEL)
    w = jnp.where(sub != SENTINEL, jnp.float32(stride), 0.0)
    return sub, w


@jax.jit
def count_unique(packed: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Number of unique values among packed[valid] — a single scalar result."""
    keys = jnp.where(valid, packed, SENTINEL)
    s = jnp.sort(keys)
    is_valid = s != SENTINEL
    boundary = jnp.concatenate([is_valid[:1], (s[1:] != s[:-1]) & is_valid[1:]])
    return jnp.sum(boundary).astype(jnp.int32)


def pack_rgba_u32(rgba_u8: jnp.ndarray) -> jnp.ndarray:
    """Pack (...,4) uint8 RGBA into (...,) uint32 r<<24|g<<16|b<<8|a."""
    r = rgba_u8[..., 0].astype(jnp.uint32)
    g = rgba_u8[..., 1].astype(jnp.uint32)
    b = rgba_u8[..., 2].astype(jnp.uint32)
    a = rgba_u8[..., 3].astype(jnp.uint32)
    return (r << 24) | (g << 16) | (b << 8) | a
