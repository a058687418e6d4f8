"""Exact Ward agglomerative clustering via parallel reciprocal-NN rounds.

Replaces sklearn.cluster.AgglomerativeClustering(linkage="ward") used by the
reference's perceptual quantizer (color_simplify.py:513-523).

TPU-first design: Ward linkage is REDUCIBLE (merging two clusters never
brings any third cluster closer than it was to either part), so merging
every reciprocal nearest-neighbor pair SIMULTANEOUSLY yields the same
dendrogram — same merge heights, same tree — as the textbook sequential
NN-chain. Each round therefore:

  1. computes every active cluster's Ward nearest neighbor,
     d(A,B) = |A||B|/(|A|+|B|) * ||muA - muB||^2, as a chunked dense
     N x B distance sweep (VPU elementwise over D=3 — deliberately NOT an
     MXU matmul: TPU f32 matmuls synthesize from bf16 and exact distances
     decide merge order);
  2. finds pairs with nn[nn[i]] == i and merges them all at once
     (vectorized centroid/size updates, scatter-drop merge recording).

A round always merges >= 1 pair (the globally closest pair is mutual), and
random data merges ~n/4 pairs per round, so the `lax.while_loop` runs
O(log n) data-wide rounds instead of the chain's ~2n latency-bound
iterations — 10k colors cluster in ~0.5 s on one chip where the chain
needed ~12 s (ROADMAP item 5).

NN-chain/RNN rounds emit merges in discovery order, NOT height order, so
cutting the tree at k clusters applies the scipy/sklearn postprocessing:
sort the n-1 recorded merges by height, apply the n-k smallest as unions
(a `fori_loop` of label-relabel steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_CHUNK = 1024  # rows per distance-sweep block (N x _CHUNK live at once)


@functools.partial(jax.jit, static_argnames=("k",))
def ward_labels(points: jnp.ndarray, n_valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Cluster points[:n_valid] into k clusters with exact Ward linkage.

    Args:
      points: (N, D) float32, rows >= n_valid are padding (ignored).
      n_valid: () int32 number of real points (callers guard n_valid >= k,
        like the reference's actual_num_colors = min(k, n_unique)).
      k: static number of clusters to cut the dendrogram at.

    Returns:
      (N,) int32 labels in [0, k); padding rows get label 0. Label numbering
      is by ascending cluster-representative index — compare as partitions.
    """
    N, D = points.shape
    idx = jnp.arange(N, dtype=jnp.int32)
    active0 = idx < n_valid
    INF = jnp.float32(jnp.inf)
    B = min(_CHUNK, N)
    nblk = -(-N // B)
    Npad = nblk * B

    def nn_all(cent, sz, act):
        """Ward nearest neighbor (index + distance) for every row, chunked."""
        centp = jnp.pad(cent, ((0, Npad - N), (0, 0)))
        szp = jnp.pad(sz, (0, Npad - N))
        actp = jnp.pad(act, (0, Npad - N))
        idxp = jnp.pad(idx, (0, Npad - N), constant_values=N)

        def block(i0):
            cb = lax.dynamic_slice_in_dim(centp, i0, B)
            szb = lax.dynamic_slice_in_dim(szp, i0, B)
            actb = lax.dynamic_slice_in_dim(actp, i0, B)
            ib = lax.dynamic_slice_in_dim(idxp, i0, B)
            d2 = jnp.zeros((B, N), jnp.float32)
            for c in range(D):
                diff = cb[:, None, c] - cent[None, :, c]
                d2 = d2 + diff * diff
            wgt = szb[:, None] * sz[None, :] / jnp.maximum(
                szb[:, None] + sz[None, :], 1e-30)
            d = jnp.where(
                actb[:, None] & act[None, :] & (ib[:, None] != idx[None, :]),
                wgt * d2, INF)
            return jnp.argmin(d, axis=1).astype(jnp.int32), jnp.min(d, axis=1)

        nn_b, dmin_b = lax.map(block, jnp.arange(nblk, dtype=jnp.int32) * B)
        return nn_b.reshape(-1)[:N], dmin_b.reshape(-1)[:N]

    # ---- Phase 1: reciprocal-NN rounds, recording all n_valid-1 merges ----
    def cond(state):
        _, _, _, n_act, _, _, _, _ = state
        return n_act > 1

    def body(state):
        cent, sz, act, n_act, mi, mj, mh, mcount = state
        nn, dmin = nn_all(cent, sz, act)
        mutual = act & (nn[nn] == idx)
        recip = mutual & (idx < nn)       # each pair counted once, at its min
        absorbed = mutual & (idx > nn)    # ... and absorbed at its max

        # Record merges in discovery order (slot = running merge counter).
        rank = jnp.cumsum(recip.astype(jnp.int32)) - 1
        slot = jnp.where(recip, mcount + rank, N)  # N = out of range, dropped
        mi = mi.at[slot].set(idx, mode="drop")
        mj = mj.at[slot].set(nn, mode="drop")
        mh = mh.at[slot].set(dmin, mode="drop")
        n_merges = recip.sum().astype(jnp.int32)

        # Apply all merges at once: keeper (i < nn[i]) absorbs its partner.
        tot = sz + sz[nn]
        mu = (cent * sz[:, None] + cent[nn] * sz[nn][:, None]) / jnp.maximum(
            tot, 1e-30)[:, None]
        cent = jnp.where(recip[:, None], mu, cent)
        sz = jnp.where(recip, tot, jnp.where(absorbed, 0.0, sz))
        act = act & ~absorbed
        return cent, sz, act, n_act - n_merges, mi, mj, mh, mcount + n_merges

    state = (
        points.astype(jnp.float32),
        active0.astype(jnp.float32),
        active0,
        n_valid.astype(jnp.int32),
        jnp.zeros((N,), jnp.int32),           # merge i (kept index)
        jnp.zeros((N,), jnp.int32),           # merge j (absorbed index)
        jnp.full((N,), INF, jnp.float32),      # merge height (INF = unused)
        jnp.int32(0),
    )
    _, _, _, _, mi, mj, mh, _ = lax.while_loop(cond, body, state)

    # ---- Phase 2: cut — apply the n_valid - k smallest merges as unions ----
    order = jnp.argsort(mh)  # unused slots are INF -> sorted last
    n_apply = jnp.maximum(n_valid - k, 0)

    def union(t, asg):
        m = order[t]

        def do(asg):
            a = asg[mi[m]]
            b = asg[mj[m]]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            return jnp.where(asg == hi, lo, asg)

        return lax.cond(t < n_apply, do, lambda a: a, asg)

    asg = lax.fori_loop(0, N, union, idx)

    # Compact representative indices to 0..k-1 (ascending representative).
    is_rep = asg == idx
    rep_rank = jnp.cumsum((is_rep & active0).astype(jnp.int32)) - 1
    labels = jnp.clip(rep_rank[asg], 0, k - 1)
    return labels.astype(jnp.int32)
