"""4-neighbor majority-vote recoloring step (harness smoother).

Reference: app/test_smoothing_algorithms.py:1066-1106 — for every interior
non-transparent pixel, if >= 3 of its 4 opaque neighbors share a color, adopt
it. One iteration is a fused shift stencil; the reference's O(H*W) Python
double loop becomes a single VPU pass.

Note the reference counts a pixel as "changed" whenever the rule fires, even
if the adopted color equals the current one (:1104-1107) — so its loop never
converges by "no changes" on stable majority pixels and instead exits via
oscillation detection. `applied` reproduces that count; `differs` counts real
changes, for callers who want actual convergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def majority_step(cid: jnp.ndarray, opaque: jnp.ndarray):
    """One majority-vote pass.

    Args:
      cid: (H, W) uint32 packed colors.
      opaque: (H, W) bool.

    Returns:
      (new_cid, applied, differs): applied = pixels where the rule fired
      (reference's pixels_changed), differs = pixels whose color actually
      changed.
    """
    h, w = cid.shape

    def shifted(x, dy, dx, fill):
        pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
        xp = jnp.pad(x, pad, constant_values=fill)
        return lax.dynamic_slice(xp, (max(dy, 0), max(dx, 0)), (h, w))

    nbs = []
    for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        nc = shifted(cid, dy, dx, 0)
        nv = shifted(opaque, dy, dx, False)
        nbs.append((nc, nv))

    # count matches for each neighbor's color among valid neighbors
    best_color = cid
    best_count = jnp.zeros((h, w), jnp.int32)
    for i, (ci, vi) in enumerate(nbs):
        cnt = jnp.zeros((h, w), jnp.int32)
        for cj, vj in nbs:
            cnt = cnt + (vi & vj & (ci == cj)).astype(jnp.int32)
        better = vi & (cnt > best_count)
        best_color = jnp.where(better, ci, best_color)
        best_count = jnp.where(better, cnt, best_count)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 1) & (ys < h - 1) & (xs >= 1) & (xs < w - 1)
    fire = interior & opaque & (best_count >= 3)
    new_cid = jnp.where(fire, best_color, cid)
    applied = jnp.sum(fire)
    differs = jnp.sum(fire & (best_color != cid))
    return new_cid, applied, differs
