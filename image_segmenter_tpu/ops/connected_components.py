"""Connected-component labeling on TPU via min-label propagation + pointer jumping.

Replaces cv2.connectedComponentsWithStats (region_cleanup.py:63) and
cv2.floodFill (region_cleanup.py:560 — a flood fill with loDiff=upDiff=0 is
exactly "recolor the seed's 4-connected same-color component").

TPU-first design: labels are linear pixel indices. Each sweep takes the min
label over same-color 4/8-neighbors (vectorized shifts, one fused VPU pass),
then pointer-jumps label <- label[label] several times (gathers), which
collapses chains logarithmically — the standard GPU label-equivalence scheme
re-expressed in XLA. The outer `lax.while_loop` runs until a fixpoint; the
whole thing is one compiled program per image shape.

A single labeling pass covers ALL colors at once: pixels connect iff both
opaque and equal color, so per-unique-color component analysis (the
reference's python loop over np.unique, region_cleanup.py:57-88) collapses
into one labeling + segment reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_JUMPS = 4  # pointer-jumping steps per propagation sweep


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill):
    h, w = x.shape
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    xp = jnp.pad(x, pad, constant_values=fill)
    return lax.dynamic_slice(xp, (max(dy, 0), max(dx, 0)), (h, w))


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_components(color_id: jnp.ndarray, valid: jnp.ndarray,
                     connectivity: int = 8) -> jnp.ndarray:
    """Label connected same-color regions.

    Args:
      color_id: (H, W) uint32/int32 per-pixel color key.
      valid: (H, W) bool; invalid pixels get label -1.
      connectivity: 4 or 8.

    Returns:
      (H, W) int32 labels; each component's label is the linear index
      (y*W + x) of its first pixel in raster order (its "root"), -1 invalid.
    """
    h, w = color_id.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(h * w)  # sentinel larger than any label
    label0 = jnp.where(valid, lin, big)
    cid = color_id.astype(jnp.int32)

    # Connectivity masks along rows/columns: connected-to-previous flags.
    same_left = jnp.concatenate(
        [jnp.zeros((h, 1), bool),
         valid[:, 1:] & valid[:, :-1] & (cid[:, 1:] == cid[:, :-1])], axis=1)
    same_up = jnp.concatenate(
        [jnp.zeros((1, w), bool),
         valid[1:, :] & valid[:-1, :] & (cid[1:, :] == cid[:-1, :])], axis=0)

    def seg_min(lbl, conn_prev, axis):
        """Min label within each same-color run along `axis` (both directions),
        via segmented associative scans — one sweep floods a whole run."""

        def comb(a, b):
            ra, va = a
            rb, vb = b
            return ra | rb, jnp.where(rb, vb, jnp.minimum(va, vb))

        reset_fwd = ~conn_prev
        _, fwd = lax.associative_scan(comb, (reset_fwd, lbl), axis=axis)
        # reverse direction: connected-to-next
        rev_reset = jnp.flip(~_next_conn(conn_prev, axis), axis=axis)
        _, bwd = lax.associative_scan(
            comb, (rev_reset, jnp.flip(lbl, axis=axis)), axis=axis)
        return jnp.minimum(fwd, jnp.flip(bwd, axis=axis))

    def _next_conn(conn_prev, axis):
        """connected-to-next flags from connected-to-previous."""
        if axis == 1:
            return jnp.concatenate([conn_prev[:, 1:], jnp.zeros((h, 1), bool)], axis=1)
        return jnp.concatenate([conn_prev[1:, :], jnp.zeros((1, w), bool)], axis=0)

    diag_shifts = [(-1, -1), (-1, 1), (1, -1), (1, 1)] if connectivity == 8 else []

    def sweep(lbl):
        best = seg_min(lbl, same_left, axis=1)
        best = seg_min(best, same_up, axis=0)
        for dy, dx in diag_shifts:
            ncid = _shift2d(cid, dy, dx, -1)
            nlbl = _shift2d(best, dy, dx, big)
            same = valid & (ncid == cid)
            best = jnp.minimum(best, jnp.where(same, nlbl, big))
        # pointer jumping: follow root links (doubles path length per hop)
        flat = best.reshape(-1)
        for _ in range(_JUMPS):
            safe = jnp.clip(flat, 0, h * w - 1)
            flat = jnp.where(flat < big, jnp.minimum(flat, flat[safe]), flat)
        return flat.reshape(h, w)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        lbl, _ = state
        new = sweep(lbl)
        return new, jnp.any(new != lbl)

    lbl, _ = lax.while_loop(cond, body, (label0, jnp.bool_(True)))
    return jnp.where(valid, lbl, -1)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def component_stats(color_id: jnp.ndarray, valid: jnp.ndarray,
                    connectivity: int = 8):
    """Labels + per-root component statistics in one compiled program.

    Returns:
      labels: (H, W) int32 root labels (-1 invalid).
      sizes: (H*W,) int32 — sizes[root] = component pixel count (0 elsewhere).
      bbox: (H*W, 4) int32 — (x_min, y_min, x_max, y_max) per root.
    """
    h, w = color_id.shape
    labels = label_components(color_id, valid, connectivity)
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, 0)
    ones = (flat >= 0).astype(jnp.int32)
    sizes = jnp.zeros((h * w,), jnp.int32).at[safe].add(ones)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    big = jnp.int32(1 << 30)
    xmin = jnp.full((h * w,), big, jnp.int32).at[safe].min(jnp.where(flat >= 0, xs, big))
    ymin = jnp.full((h * w,), big, jnp.int32).at[safe].min(jnp.where(flat >= 0, ys, big))
    xmax = jnp.full((h * w,), -1, jnp.int32).at[safe].max(jnp.where(flat >= 0, xs, -1))
    ymax = jnp.full((h * w,), -1, jnp.int32).at[safe].max(jnp.where(flat >= 0, ys, -1))
    bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return labels, sizes, bbox


@jax.jit
def flood_fill_component(rgba: jnp.ndarray, seed_yx: jnp.ndarray,
                         fill_rgb: jnp.ndarray) -> jnp.ndarray:
    """Recolor the 4-connected exact-color component containing the seed.

    Equivalent to the reference's cv.floodFill with loDiff=upDiff=(0,0,0) and
    FLOODFILL_FIXED_RANGE on non-transparent pixels (region_cleanup.py:515-574).
    Transparent seeds and out-of-bounds are handled by the compat wrapper.
    """
    h, w = rgba.shape[:2]
    from image_segmenter_tpu.ops.color import pack_rgb_u32

    cid = pack_rgb_u32(rgba[..., :3])
    # NOTE: cv2.floodFill ignores alpha; it fills same-color pixels whether or
    # not they are transparent. The reference passes the full rgb plane.
    valid = jnp.ones((h, w), jnp.bool_)
    labels = label_components(cid, valid, connectivity=4)
    seed_label = labels[seed_yx[0], seed_yx[1]]
    mask = labels == seed_label
    rgb = jnp.where(mask[..., None], fill_rgb[None, None, :].astype(jnp.uint8),
                    rgba[..., :3])
    return jnp.concatenate([rgb, rgba[..., 3:]], axis=-1)
