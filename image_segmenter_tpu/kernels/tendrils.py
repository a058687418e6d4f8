"""Tendril trimming as XLA segmented scans (reference tendril_trimming.py).

The reference marks a pixel as a tendril when its horizontal OR vertical
same-color run length is <= threshold, then recolors scan-line runs of marked
pixels to the run's majority color (long runs) or an adjacent normal color
(short runs), iterating to a fixpoint (<=30 iterations). Its marking loop is
O(H*W*runlength) pure Python (:98-166) and its processing another pass of
Python scanning (:182-264).

TPU-first design:
- Run lengths come from two `cummax` prefix scans per axis: a boundary flag
  (color change / transparency) turns position into "last boundary at or
  before me", giving run start; the mirrored scan gives run end. O(H*W).
- Majority color per marked run: a stable two-key sort groups (segment,
  color) pairs; segment reductions produce per-(segment,color) counts and
  first-occurrence positions; scatter-max with a packed (count, -first_pos)
  key picks the reference's majority + first-seen tie-break exactly
  (:286-290, :312-316).
- Alpha sentinels (NORMAL=10, H_THIN=11, V_THIN=12, BOTH=13) and the
  horizontal-then-vertical pass order are preserved bit-for-bit, including
  the rule that BOTH pixels are handled by the horizontal pass (:194) and
  that short-run pixels adopt the first NORMAL 4-neighbor in up/down/left/
  right order (:318-337).

The whole trim loop runs as one jitted `lax.while_loop`; the host sees only
the final image and the iteration count.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from image_segmenter_tpu.ops.color import pack_rgb_u32, unpack_rgb_u32

NORMAL = 10
H_THIN = 11
V_THIN = 12
BOTH_THIN = 13


def _run_extents(cid: jnp.ndarray, opaque: jnp.ndarray):
    """Per-pixel same-color run [start, end] along axis 1 (rows).

    A run breaks at transparency or color change. Returns (start, end) int32
    arrays shaped like cid; meaningless at transparent pixels.
    """
    h, w = cid.shape
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    left_same = jnp.concatenate(
        [jnp.zeros((h, 1), bool),
         (cid[:, 1:] == cid[:, :-1]) & opaque[:, 1:] & opaque[:, :-1]], axis=1)
    start = lax.cummax(jnp.where(left_same, -1, xs), axis=1)
    right_same = jnp.concatenate(
        [(cid[:, 1:] == cid[:, :-1]) & opaque[:, 1:] & opaque[:, :-1],
         jnp.zeros((h, 1), bool)], axis=1)
    end = -lax.cummax(jnp.where(right_same, -w, -xs)[:, ::-1], axis=1)[:, ::-1]
    return start, end


def _mark(rgb_cid: jnp.ndarray, opaque: jnp.ndarray, threshold: jnp.ndarray):
    """Alpha sentinel plane + tendril count (reference _mark_tendrils)."""
    s, e = _run_extents(rgb_cid, opaque)
    h_thick = e - s + 1
    sT, eT = _run_extents(rgb_cid.T, opaque.T)
    v_thick = (eT - sT + 1).T
    h_thin = opaque & (h_thick <= threshold)
    v_thin = opaque & (v_thick <= threshold)
    alpha = jnp.where(
        opaque,
        jnp.where(h_thin & v_thin, BOTH_THIN,
                  jnp.where(h_thin, H_THIN, jnp.where(v_thin, V_THIN, NORMAL))),
        0,
    ).astype(jnp.uint8)
    count = jnp.sum(h_thin | v_thin)
    return alpha, count


def _majority_per_run(marked: jnp.ndarray, cid: jnp.ndarray):
    """Majority color of each horizontal run of marked pixels.

    Returns (seg_start, seg_end, majority_cid) per pixel (valid at marked
    pixels). Tie-break: highest count, then first occurrence scanning the run
    (reference :286-290).
    """
    h, w = marked.shape
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    left_m = jnp.concatenate([jnp.zeros((h, 1), bool), marked[:, 1:] & marked[:, :-1]], axis=1)
    start = lax.cummax(jnp.where(left_m, -1, xs), axis=1)
    right_m = jnp.concatenate([marked[:, 1:] & marked[:, :-1], jnp.zeros((h, 1), bool)], axis=1)
    end = -lax.cummax(jnp.where(right_m, -w, -xs)[:, ::-1], axis=1)[:, ::-1]

    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    seg = (rows * w + start).reshape(-1)            # unique segment id
    seg = jnp.where(marked.reshape(-1), seg, h * w)  # unmarked -> dump slot
    colr = cid.reshape(-1)
    xoff = (xs - start).reshape(-1)                  # position within run

    # Group identical (seg, color): stable sort by color then by seg.
    o1 = jnp.argsort(colr, stable=True)
    seg1, col1, x1 = seg[o1], colr[o1], xoff[o1]
    o2 = jnp.argsort(seg1, stable=True)
    seg2, col2, x2 = seg1[o2], col1[o2], x1[o2]

    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), (seg2[1:] != seg2[:-1]) | (col2[1:] != col2[:-1])])
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    n = seg2.shape[0]
    counts = jnp.zeros((n + 1,), jnp.int32).at[gid].add(jnp.where(seg2 < h * w, 1, 0))
    first_x = jnp.full((n + 1,), 1 << 20, jnp.int32).at[gid].min(
        jnp.where(seg2 < h * w, x2, 1 << 20))

    # Packed preference key: count major, earlier-first tie-break minor.
    W2 = 1 << 13  # > max run length (W <= 8192 supported)
    key = counts[gid] * W2 + (W2 - 1 - jnp.minimum(first_x[gid], W2 - 1))
    best_key = jnp.zeros((h * w + 1,), jnp.int32).at[seg2].max(key)
    is_best = key == best_key[seg2]
    maj = jnp.full((h * w + 1,), 0, jnp.uint32).at[seg2].max(
        jnp.where(is_best, col2, 0).astype(jnp.uint32))

    maj_px = maj[jnp.where(marked.reshape(-1), (rows * w + start).reshape(-1), h * w)]
    return start, end, maj_px.reshape(h, w)


def _adjacent_normal_color(cid: jnp.ndarray, alpha: jnp.ndarray):
    """First NORMAL 4-neighbor's color in up/down/left/right order
    (reference _find_adjacent_color :318-337). Returns (color, found)."""
    h, w = cid.shape

    def shifted(x, dy, dx, fill):
        pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
        xp = jnp.pad(x, pad, constant_values=fill)
        return lax.dynamic_slice(xp, (max(dy, 0), max(dx, 0)), (h, w))

    color = jnp.zeros((h, w), jnp.uint32)
    found = jnp.zeros((h, w), bool)
    for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        n_alpha = shifted(alpha, dy, dx, 0)
        n_cid = shifted(cid, dy, dx, 0)
        ok = (n_alpha == NORMAL) & ~found
        color = jnp.where(ok, n_cid, color)
        found = found | (n_alpha == NORMAL)
    return color, found


def _process_axis(cid: jnp.ndarray, alpha: jnp.ndarray, threshold: jnp.ndarray,
                  horizontal: bool):
    """One directional pass (reference _process_{horizontal,vertical}_tendrils)."""
    if horizontal:
        marked = (alpha == H_THIN) | (alpha == BOTH_THIN)
        c, a = cid, alpha
    else:
        marked = alpha == V_THIN
        c, a = cid.T, alpha.T

    m = marked if horizontal else marked.T
    start, end, maj = _majority_per_run(m, c)
    run_len = end - start + 1
    long_run = run_len > threshold

    adj_color, adj_found = _adjacent_normal_color(cid, alpha)
    if not horizontal:
        adj_color, adj_found = adj_color.T, adj_found.T

    new_c = jnp.where(m & long_run, maj,
                      jnp.where(m & adj_found, adj_color, c))
    changed = m & (long_run | adj_found)
    new_a = jnp.where(changed, NORMAL, a).astype(jnp.uint8)
    if not horizontal:
        new_c, new_a = new_c.T, new_a.T
    return new_c, new_a


@jax.jit
def trim_tendrils_core(rgba: jnp.ndarray, threshold: jnp.ndarray,
                       max_iterations: jnp.ndarray):
    """Full trim loop. Returns (rgba_out, iterations_used)."""
    opaque0 = rgba[..., 3] > 0
    cid0 = pack_rgb_u32(rgba[..., :3])

    def cond(state):
        _, it, go = state
        return go & (it < max_iterations)

    def body(state):
        cid, it, _ = state
        alpha, count = _mark(cid, opaque0, threshold)

        def run(args):
            cid, alpha = args
            cid, alpha = _process_axis(cid, alpha, threshold, True)
            cid, alpha = _process_axis(cid, alpha, threshold, False)
            return cid

        cid = lax.cond(count > 0, run, lambda a: a[0], (cid, alpha))
        return cid, it + jnp.where(count > 0, 1, 0), count > 0

    cid, iters, _ = lax.while_loop(cond, body, (cid0, jnp.int32(0), jnp.bool_(True)))
    rgb = unpack_rgb_u32(cid)
    alpha_out = jnp.where(opaque0, 255, rgba[..., 3]).astype(jnp.uint8)
    return jnp.concatenate([rgb, alpha_out[..., None]], axis=-1), iters


@jax.jit
def mark_tendrils_core(rgba: jnp.ndarray, threshold: jnp.ndarray):
    """One marking pass on the current image: returns (alpha_plane, count)."""
    opaque = rgba[..., 3] > 0
    cid = pack_rgb_u32(rgba[..., :3])
    return _mark(cid, opaque, threshold)


@jax.jit
def process_tendrils_core(rgba_rgb_cid: jnp.ndarray, alpha: jnp.ndarray,
                          threshold: jnp.ndarray):
    """Horizontal + vertical processing of pre-marked sentinels."""
    cid, a = rgba_rgb_cid, alpha
    cid, a = _process_axis(cid, a, threshold, True)
    cid, a = _process_axis(cid, a, threshold, False)
    return cid, a


@jax.jit
def magenta_cleanup_core(cid: jnp.ndarray, alpha: jnp.ndarray):
    """Recolor any remaining marked pixels from an adjacent NORMAL color,
    gray fallback (reference _apply_color_selection_to_magenta :362-389).

    The reference resolves pixels sequentially in raster order (earlier fixes
    feed later ones); this resolves iteratively until a fixpoint, which
    yields the same result whenever resolution order doesn't matter and a
    deterministic left-to-right-equivalent sweep otherwise.
    """
    marked0 = (alpha == H_THIN) | (alpha == V_THIN) | (alpha == BOTH_THIN)
    n0 = jnp.sum(marked0)

    def cond(state):
        _, _, progress = state
        return progress

    def body(state):
        cid, a, _ = state
        marked = (a == H_THIN) | (a == V_THIN) | (a == BOTH_THIN)
        color, found = _adjacent_normal_color(cid, a)
        new_cid = jnp.where(marked & found, color, cid)
        new_a = jnp.where(marked & found, NORMAL, a).astype(jnp.uint8)
        return new_cid, new_a, jnp.any(marked & found)

    cid, a, _ = lax.while_loop(cond, body, (cid, alpha, jnp.bool_(True)))
    # leftovers (no NORMAL reachable) -> gray 128
    marked = (a == H_THIN) | (a == V_THIN) | (a == BOTH_THIN)
    gray = jnp.uint32((128 << 16) | (128 << 8) | 128)
    cid = jnp.where(marked, gray, cid)
    a = jnp.where(marked, NORMAL, a).astype(jnp.uint8)
    return cid, a, n0
