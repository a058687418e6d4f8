"""Exact Ward agglomerative clustering via the nearest-neighbor chain.

Replaces sklearn.cluster.AgglomerativeClustering(linkage="ward") used by the
reference's perceptual quantizer (color_simplify.py:513-523).

TPU-first design: hierarchical clustering is inherently sequential (n-1
merges), but each step only needs nearest-neighbor distances from one cluster
to all others — an O(n) vector op. The NN-chain algorithm (the same one
sklearn uses for ward without connectivity) runs as a `lax.while_loop` over
fixed-size arrays: centroids/sizes/active masks of static length n, a static
chain stack, and a recorded merge list. No host round trips, no n^2 distance
matrix; ward distances are recomputed on the fly from centroids as
d(A,B) = |A||B|/(|A|+|B|) * ||muA - muB||^2 (monotone in the ward criterion,
so merge heights sort identically).

NN-chain emits merges in chain order, NOT height order, so cutting the tree
at k clusters requires the scipy/sklearn postprocessing: sort the n-1
recorded merges by height and apply only the n-k smallest as unions. The cut
runs as a `fori_loop` of O(n) label-relabel steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


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
    idx = jnp.arange(N)
    active0 = idx < n_valid
    INF = jnp.float32(jnp.inf)

    def ward_d(cent, sz, act, i):
        mu = cent[i]
        d2 = jnp.sum((cent - mu) ** 2, axis=-1)
        w = sz * sz[i] / jnp.maximum(sz + sz[i], 1e-30)
        return jnp.where(act & (idx != i), w * d2, INF)

    # ---- Phase 1: full NN-chain, recording all n_valid-1 merges ----
    def cond(state):
        _, _, act, _, _, n_act, _, _, _ = state
        return n_act > 1

    def body(state):
        cent, sz, act, ch, clen, n_act, mi, mj, mh = state

        def start_chain(args):
            ch, clen = args
            first = jnp.argmax(act)
            return ch.at[0].set(first.astype(jnp.int32)), jnp.int32(1)

        ch, clen = lax.cond(clen == 0, start_chain, lambda a: a, (ch, clen))
        top = ch[clen - 1]
        d = ward_d(cent, sz, act, top)
        nn = jnp.argmin(d).astype(jnp.int32)
        prev = jnp.where(clen >= 2, ch[clen - 2], jnp.int32(-1))

        def merge(args):
            cent, sz, act, ch, clen, n_act, mi, mj, mh = args
            i = jnp.minimum(top, nn)
            j = jnp.maximum(top, nn)
            h = d[nn]
            m = n_valid - n_act  # merge counter: 0 .. n_valid-2
            mi = mi.at[m].set(i)
            mj = mj.at[m].set(j)
            mh = mh.at[m].set(h)
            tot = sz[i] + sz[j]
            mu = (cent[i] * sz[i] + cent[j] * sz[j]) / tot
            cent = cent.at[i].set(mu)
            sz = sz.at[i].set(tot).at[j].set(0.0)
            act = act.at[j].set(False)
            return cent, sz, act, ch, clen - 2, n_act - 1, mi, mj, mh

        def grow(args):
            cent, sz, act, ch, clen, n_act, mi, mj, mh = args
            return cent, sz, act, ch.at[clen].set(nn), clen + 1, n_act, mi, mj, mh

        return lax.cond(nn == prev, merge, grow,
                        (cent, sz, act, ch, clen, n_act, mi, mj, mh))

    state = (
        points.astype(jnp.float32),
        active0.astype(jnp.float32),
        active0,
        jnp.zeros((N + 2,), jnp.int32),
        jnp.int32(0),
        n_valid.astype(jnp.int32),
        jnp.zeros((N,), jnp.int32),           # merge i (kept index)
        jnp.zeros((N,), jnp.int32),           # merge j (absorbed index)
        jnp.full((N,), INF, jnp.float32),      # merge height (INF = unused)
    )
    _, _, _, _, _, _, mi, mj, mh = lax.while_loop(cond, body, state)

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

    asg = lax.fori_loop(0, N, union, idx.astype(jnp.int32))

    # Compact representative indices to 0..k-1 (ascending representative).
    is_rep = asg == idx.astype(jnp.int32)
    rep_rank = jnp.cumsum((is_rep & active0).astype(jnp.int32)) - 1
    labels = jnp.clip(rep_rank[asg], 0, k - 1)
    return labels.astype(jnp.int32)
