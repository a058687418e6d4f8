"""Weighted Lloyd k-means with k-means++ init, as a single jitted XLA program.

Replaces sklearn.cluster.KMeans(n_clusters, random_state=42, n_init=10)
(reference color_simplify.py:79-81, :669-675, :811-814, :992-993).

TPU-first design
----------------
- Points never move to the host: assignment is a blocked (N,D)@(D,K) matmul
  on the MXU (f32, HIGHEST precision — K and D are small, so the matmul is
  bandwidth-bound and exact), argmin on the VPU, and center updates are
  one-hot (K,Nb)@(Nb,D) matmuls accumulated across blocks — no scatters.
- Invalid points (transparent / black-filtered pixels) are handled by a
  weight vector instead of gathers, keeping every shape static. A weight of
  0 removes a point from init sampling, center updates, and inertia.
- n_init restarts run sequentially under `lax.fori_loop` (bounded memory),
  each a full kmeans++ + Lloyd solve; the best inertia wins, mirroring
  sklearn's restart semantics. Seeding is jax.random.fold_in(key, restart).
- Lloyd iterates under `lax.while_loop` until center shift^2 <= tol or
  max_iter, like sklearn's tol=1e-4 (relative to mean point variance).
- Empty clusters are re-seeded from the current farthest points (sklearn
  relocates empty clusters to high-inertia points).

The result is not bit-identical to sklearn (different PRNG stream), but
matches in inertia and palette up to clustering tolerance — asserted in
tests/test_kmeans.py against the sklearn oracle.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_BLOCK = 1 << 17  # 131072 points per assignment block


class KMeansResult(NamedTuple):
    centers: jnp.ndarray  # (k, d) float32
    inertia: jnp.ndarray  # () float32


def _pad_points(points: jnp.ndarray, weights: jnp.ndarray):
    """Pad N to a multiple of the block size with zero-weight points.

    Small inputs (e.g. the pipeline's 16k-sample sketch fit) get one
    right-sized block instead of a full 131k block — padding 16k to 131k
    made every assignment matmul do 8x the work."""
    n, d = points.shape
    block = min(_BLOCK, max(1024, -(-n // 1024) * 1024))
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        points = jnp.concatenate([points, jnp.zeros((pad, d), points.dtype)])
        weights = jnp.concatenate([weights, jnp.zeros((pad,), weights.dtype)])
    return points.reshape(nb, block, d), weights.reshape(nb, block)


def _pairwise_d2(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances (n, k) via |x|^2 - 2 x.c + |c|^2 (MXU)."""
    xc = lax.dot_general(
        x, c.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    return jnp.maximum(x2 - 2.0 * xc + c2, 0.0)


def _min_d2_blocked(pts: jnp.ndarray, w: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Per-point min distance^2 to any center, zeroed for w==0. (nb, B)."""
    def block(pb_wb):
        pb, wb = pb_wb
        d2 = _pairwise_d2(pb, centers)
        return jnp.min(d2, axis=1) * (wb > 0)

    if pts.shape[0] == 1:  # single block: skip the scan (sequential-step cost)
        return block((pts[0], w[0]))[None]
    return lax.map(block, (pts, w))


def _kmeanspp_init(key, pts, w, k: int, n_local_trials: int) -> jnp.ndarray:
    """Greedy k-means++ over weighted points (sklearn _kmeans_plusplus shape)."""
    nb, B, d = pts.shape
    flatp = pts.reshape(nb * B, d)
    flatw = w.reshape(nb * B)

    # First center: sample proportional to weight. (An inverse-CDF sampler
    # — cumsum + uniform + rank count — was tried to avoid categorical()'s
    # full-size gumbel draw; it measured no faster on-chip and its different
    # PRNG stream pushed one corpus photo past the SSE-ratio contract, so
    # the categorical stream is kept.)
    key, k0 = jax.random.split(key)
    logits = jnp.where(flatw > 0, jnp.log(jnp.maximum(flatw, 1e-30)), -jnp.inf)
    idx0 = jax.random.categorical(k0, logits)
    centers = jnp.zeros((k, d), jnp.float32).at[0].set(flatp[idx0])

    min_d2 = _min_d2_blocked(pts, w, centers[0:1]).reshape(-1)

    def step(i, state):
        key, centers, min_d2 = state
        key, kc = jax.random.split(key)
        pot = flatw * min_d2
        logits = jnp.where(pot > 0, jnp.log(jnp.maximum(pot, 1e-30)), -jnp.inf)
        cand_idx = jax.random.categorical(kc, logits, shape=(n_local_trials,))
        cands = flatp[cand_idx]  # (T, d)

        # Evaluate candidates: new potential if candidate became a center.
        # The per-candidate clipped distances are reused below (the winner's
        # column IS the min_d2 update — no second distance pass needed).
        def block(pb_wb):
            pb, wb, md = pb_wb
            d2 = _pairwise_d2(pb, cands)  # (B, T)
            nd = jnp.minimum(d2, md[:, None]) * (wb > 0)[:, None]
            return jnp.sum(nd * wb[:, None], axis=0), nd

        if nb == 1:  # single block: skip both scans (init is latency-bound)
            pots_b, nd = block((pts[0], w[0], min_d2))
            pots = pots_b[None]
        else:
            pots, nd_blocks = lax.map(block, (pts, w, min_d2.reshape(nb, B)))
            nd = nd_blocks.reshape(nb * B, -1)
        best = jnp.argmin(jnp.sum(pots, axis=0))
        chosen = cands[best]
        centers = centers.at[i].set(chosen)
        min_d2 = lax.dynamic_index_in_dim(nd, best, axis=1, keepdims=False)
        return key, centers, min_d2

    _, centers, _ = lax.fori_loop(1, k, step, (key, centers, min_d2))
    return centers


def _lloyd(pts, w, centers, max_iter: int, tol: jnp.ndarray):
    """Weighted Lloyd iterations until shift^2 <= tol. Returns KMeansResult."""
    nb, B, d = pts.shape
    k = centers.shape[0]

    def assign_stats(centers):
        def block(carry, pb_wb):
            sums, counts, inertia = carry
            pb, wb = pb_wb
            d2 = _pairwise_d2(pb, centers)  # (B, k)
            lbl = jnp.argmin(d2, axis=1)
            onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32) * wb[:, None])
            # Accumulate sums on the VPU (exact f32), not the MXU: TPU f32
            # matmuls synthesize from bf16 passes, and the ~1e-7 relative
            # error they add turns exact integer cluster means (e.g. a pure
            # color at 115.0) into 114.9999, which the uint8 cast truncates.
            sums = sums + jnp.sum(onehot[:, :, None] * pb[:, None, :], axis=0)
            counts = counts + jnp.sum(onehot, axis=0)
            inertia = inertia + jnp.sum(jnp.min(d2, axis=1) * wb)
            return (sums, counts, inertia), None

        init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32), jnp.float32(0))
        if nb == 1:  # single block: skip the scan (sequential-step cost)
            (sums, counts, inertia), _ = block(init, (pts[0], w[0]))
        else:
            (sums, counts, inertia), _ = lax.scan(block, init, (pts, w))
        return sums, counts, inertia

    def reseed_empty(centers, counts):
        """Move empty clusters onto current farthest points.

        Branchless on purpose: this runs inside the Lloyd while_loop, which
        the pipeline vmaps over the batch — under vmap a `lax.cond` executes
        BOTH branches every iteration, so the former cond+fori(k)+scatter
        formulation paid ~2k sequential scatter/argmax ops per iteration
        whether or not any cluster was empty. The sequential
        argmax-then-zero recurrence selects exactly the k distinct farthest
        points in order, i.e. `top_k(md, k)` (ties: both argmax and top_k
        take the lowest index first), so the i-th empty slot takes the i-th
        farthest point — identical semantics, three fused ops.
        """
        md = _min_d2_blocked(pts, w, centers).reshape(-1)
        _, far_idx = lax.top_k(md, k)
        far_pts = pts.reshape(-1, d)[far_idx]          # (k, d) tiny gather
        empty = counts == 0
        slot = jnp.clip(jnp.cumsum(empty.astype(jnp.int32)) - 1, 0, k - 1)
        return jnp.where(empty[:, None], far_pts[slot], centers)

    def cond(state):
        _, shift2, it, _ = state
        return (shift2 > tol) & (it < max_iter)

    def body(state):
        centers, _, it, _ = state
        sums, counts, inertia = assign_stats(centers)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers)
        new = reseed_empty(new, counts)
        shift2 = jnp.sum((new - centers) ** 2)
        return new, shift2, it + 1, inertia

    centers, _, _, _ = lax.while_loop(cond, body, (centers, jnp.float32(jnp.inf), 0, jnp.float32(0)))
    # Snap near-integer means to the integer: guards the remaining f32
    # pairwise-summation error for clusters whose true mean is integral
    # (pure-color clusters), where a downstream uint8 cast would truncate.
    rounded = jnp.round(centers)
    centers = jnp.where(jnp.abs(centers - rounded) < 1e-3, rounded, centers)
    # Final stats at converged centers
    _, counts, inertia = assign_stats(centers)
    return KMeansResult(centers=centers, inertia=inertia)


def _lloyd_batched(pts, w, centers_all, max_iter: int, tol: jnp.ndarray):
    """All n_init restarts as ONE lock-step Lloyd: the restart axis is merged
    into the centers' column dimension, so each iteration's assignment is a
    single (B, R*k) matmul per block and every pass reads the points ONCE
    for all restarts (the sequential fori_loop re-reads them per restart —
    at 16k points the loop is latency-bound, and this halves the
    sequential-step count; VERDICT r4 item 3). Converged restarts freeze
    (centers carried unchanged) while stragglers finish; each restart's
    trajectory is identical to its sequential `_lloyd` run because per-
    column matmul results don't depend on the other columns. Returns the
    best restart's KMeansResult (argmin inertia — first-min on ties, like
    the sequential scan)."""
    nb, B, d = pts.shape
    R, k, _ = centers_all.shape

    def assign_stats(call):
        cflat = call.reshape(R * k, d)

        def block(carry, pb_wb):
            sums, counts, inertia = carry
            pb, wb = pb_wb
            d2 = _pairwise_d2(pb, cflat).reshape(-1, R, k)
            lbl = jnp.argmin(d2, axis=2)                       # (B, R)
            onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32)
                      * wb[:, None, None])                     # (B, R, k)
            # VPU accumulation for exact integer means (see _lloyd).
            sums = sums + jnp.sum(onehot[..., None] * pb[:, None, None, :],
                                  axis=0)
            counts = counts + jnp.sum(onehot, axis=0)
            inertia = inertia + jnp.sum(jnp.min(d2, axis=2) * wb[:, None],
                                        axis=0)
            return (sums, counts, inertia), None

        init = (jnp.zeros((R, k, d), jnp.float32),
                jnp.zeros((R, k), jnp.float32), jnp.zeros((R,), jnp.float32))
        if nb == 1:
            out, _ = block(init, (pts[0], w[0]))
        else:
            out, _ = lax.scan(block, init, (pts, w))
        return out

    def reseed_empty(call, counts):
        cflat = call.reshape(R * k, d)

        def block(pb_wb):
            pb, wb = pb_wb
            d2 = _pairwise_d2(pb, cflat).reshape(-1, R, k)
            return jnp.min(d2, axis=2) * (wb > 0)[:, None]     # (B, R)

        if nb == 1:
            md = block((pts[0], w[0]))
        else:
            md = lax.map(block, (pts, w)).reshape(nb * B, R)
        _, far_idx = lax.top_k(md.T, k)                        # (R, k)
        far_pts = pts.reshape(-1, d)[far_idx]                  # (R, k, d)
        empty = counts == 0
        slot = jnp.clip(jnp.cumsum(empty.astype(jnp.int32), axis=1) - 1,
                        0, k - 1)
        picked = jnp.take_along_axis(far_pts, slot[..., None], axis=1)
        return jnp.where(empty[..., None], picked, call)

    def cond(state):
        _, shift2, it, _ = state
        return jnp.any(shift2 > tol) & (it < max_iter)

    def body(state):
        call, shift2, it, _ = state
        sums, counts, inertia = assign_stats(call)
        new = jnp.where(counts[..., None] > 0,
                        sums / jnp.maximum(counts, 1.0)[..., None], call)
        new = reseed_empty(new, counts)
        active = shift2 > tol                                  # (R,)
        new = jnp.where(active[:, None, None], new, call)
        shift2 = jnp.sum((new - call) ** 2, axis=(1, 2))
        return new, shift2, it + 1, inertia

    centers_all, _, _, _ = lax.while_loop(
        cond, body,
        (centers_all, jnp.full((R,), jnp.inf, jnp.float32), 0,
         jnp.zeros((R,), jnp.float32)))
    rounded = jnp.round(centers_all)
    centers_all = jnp.where(jnp.abs(centers_all - rounded) < 1e-3, rounded,
                            centers_all)
    _, _, inertia = assign_stats(centers_all)
    best = jnp.argmin(inertia)
    return KMeansResult(centers=centers_all[best], inertia=inertia[best])


@functools.partial(jax.jit,
                   static_argnames=("k", "n_init", "max_iter",
                                    "batch_restarts"))
def kmeans_fit(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    k: int,
    *,
    n_init: int = 10,
    max_iter: int = 300,
    seed: int = 42,
    batch_restarts: bool | None = None,
) -> KMeansResult:
    """Fit weighted k-means. points (N, D) float32, weights (N,) float32 >= 0.

    Matches the sklearn call sites in the reference: tol is 1e-4 times the
    mean per-dimension variance of the (weighted) points, init is greedy
    kmeans++ with 2 + floor(log(k)) local trials, n_init restarts.

    batch_restarts: None (default) picks automatically — batched Lloyd for
    n_init >= 4, sequential below (see the measured trade at the gate).
    True/False force the respective path (same result bit-for-bit; tested).
    """
    points = points.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    pts, w = _pad_points(points, weights)

    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts.reshape(-1, points.shape[1]) * w.reshape(-1, 1), axis=0) / wsum
    var = jnp.sum(((pts.reshape(-1, points.shape[1]) - mean) ** 2) * w.reshape(-1, 1), axis=0) / wsum
    tol = 1e-4 * jnp.mean(var) * k  # scaled by k: tol vs total shift^2 across centers

    n_local_trials = 2 + int(math.log(max(k, 2)))  # sklearn's heuristic
    key = jax.random.PRNGKey(seed)

    # kmeans++ inits run BATCHED across restarts: the init has a fixed
    # iteration count (k-1), so vmapping it over restarts has none of the
    # lock-step penalty that made batched Lloyd 5x slower — and the init is
    # the latency-heavy half (measured 8.7 of 10.6 ms per restart at 16k
    # points under the pipeline's b=4 vmap).
    rkeys = jnp.stack([jax.random.fold_in(key, i) for i in range(n_init)])
    centers0_all = jax.vmap(
        lambda rk: _kmeanspp_init(rk, pts, w, k, n_local_trials))(rkeys)

    if batch_restarts is None:
        batch_restarts = n_init >= 4
    if batch_restarts and n_init > 1:
        # One lock-step Lloyd over a merged restart axis (_lloyd_batched):
        # each iteration reads the points ONCE for all restarts, at the
        # cost of every restart paying max-over-restarts iterations.
        # Measured on v5e r5 (bench/micro_kmeans_restart.py): the trade
        # WINS at the compat shape (1M pts, R=10: 12.1 s -> 9.0 s, 1.35x)
        # where the pass is bandwidth-bound, and LOSES at small restart
        # counts (16k pts, R=2 under the b=4 vmap: 182 -> 354 ms) where
        # lock-step stretching dominates the single saved pass — hence the
        # n_init >= 4 gate. (The throughput pipeline bypasses both paths
        # via kmeans_fit_det: 101 ms at the same pipeline shape.)
        return _lloyd_batched(pts, w, centers0_all, max_iter, tol)

    def one_restart(i, best):
        res = _lloyd(pts, w, centers0_all[i], max_iter, tol)
        better = res.inertia < best.inertia
        return KMeansResult(
            centers=jnp.where(better, res.centers, best.centers),
            inertia=jnp.where(better, res.inertia, best.inertia),
        )

    init = KMeansResult(
        centers=jnp.zeros((k, points.shape[1]), jnp.float32),
        inertia=jnp.float32(jnp.inf),
    )
    return lax.fori_loop(0, n_init, one_restart, init)


@functools.partial(jax.jit, static_argnames=("k", "max_iter", "candidates"))
def kmeans_fit_det(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    k: int,
    *,
    max_iter: int = 300,
    candidates: int = 8,
) -> KMeansResult:
    """Deterministic, sampling-free k-means for the throughput pipeline.

    Greedy-potential kmeans++ seeding with DETERMINISTIC candidate
    selection — each step's candidates are the T=`candidates` points with
    the largest weighted potential w*min_d2 (top_k, ties to lowest index),
    the winner is the candidate minimizing the TOTAL resulting potential
    (exactly sklearn's greedy kmeans++ scoring rule, with argmax-by-
    potential replacing the categorical D^2 draw) — followed by ONE Lloyd
    run. No restarts, no PRNG. Properties the pipeline needs that
    sampling-based kmeans++ (`kmeans_fit`) cannot give:

    - mesh invariance: every per-point quantity (d2, w*min_d2) is
      elementwise, and the only cross-point reductions (the T candidate
      potentials per step, the Lloyd stats) run single-device-ordered when
      the caller pins the sample to batch-only sharding
      (pipeline/segment.quantize_stage) — the same sample fits to
      bit-identical centers on 1 chip and on any mesh;
    - perturbation stability: O(10) flipped mask pixels (the sharded
      matting's boundary-band alpha flips) perturb a few sample weights by
      O(1) counts; near-tied stratified candidates may swap, but the
      potential-greedy winner keeps the FIT QUALITY stable, where one
      flipped categorical kmeans++ draw can select any point in the image
      and rewrite the whole restart trajectory. (MULTICHIP_r04's apparent
      34% quant-err swing was later traced to an evaluation-domain
      artifact — __graft_entry__.py — but the flip mechanism is real and
      det-fit removes it by construction rather than by luck.);
    - latency: one seeding pass + one Lloyd vs n_init restarts of both
      (the kmeans++ init alone was ~8.7 of 10.6 ms/restart at 16k points).

    (An earlier bins^3-histogram variant was integer-exact but could not
    place two seeds inside one bin — tight-palette textures lost up to
    7.7x inertia (round-5 corpus gate); seeding over the actual points
    resolves arbitrarily tight clusters.)
    """
    points = points.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    n, d = points.shape
    pts, w = _pad_points(points, weights)
    nb, B, _ = pts.shape
    flatp = pts.reshape(nb * B, d)
    flatw = w.reshape(nb * B)

    # first seed: heaviest point (deterministic analog of sampling prop. w)
    c0 = flatp[jnp.argmax(flatw)]
    centers = jnp.zeros((k, d), jnp.float32).at[0].set(c0)
    min_d2 = _min_d2_blocked(pts, w, centers[0:1]).reshape(-1)

    T = candidates

    def step(i, state):
        centers, min_d2 = state
        # Deterministic analog of kmeans++'s sample-prop-to-D^2: stratify
        # the potential CDF — one candidate at each of T fixed quantiles of
        # cumsum(w*min_d2). (Plain top_k by individual potential failed on
        # smooth gradients: the T largest-potential points all sit at the
        # far extreme of the gradient, near-duplicates of each other, and
        # the greedy winner can only pick from them — measured 1.3-2.3x
        # inertia on sky scenes. Stratified candidates are diverse exactly
        # the way D^2 sampling is diverse.)
        pot = flatw * min_d2
        cdf = jnp.cumsum(pot)
        targets = (jnp.arange(T, dtype=jnp.float32) + 0.5) / T * cdf[-1]
        cand_idx = jnp.clip(jnp.searchsorted(cdf, targets),
                            0, flatp.shape[0] - 1)
        cands = flatp[cand_idx]  # (T, d)

        # Candidate potentials; the winner's clipped-distance column IS the
        # min_d2 update (same reuse as _kmeanspp_init).
        def block(pb_wb):
            pb, wb, md = pb_wb
            d2 = _pairwise_d2(pb, cands)  # (B, T)
            nd = jnp.minimum(d2, md[:, None]) * (wb > 0)[:, None]
            return jnp.sum(nd * wb[:, None], axis=0), nd

        if nb == 1:  # single block: skip the scan (init is latency-bound)
            pots_b, nd = block((pts[0], w[0], min_d2))
            pots = pots_b[None]
        else:
            pots, nd_blocks = lax.map(block, (pts, w, min_d2.reshape(nb, B)))
            nd = nd_blocks.reshape(nb * B, -1)
        best = jnp.argmin(jnp.sum(pots, axis=0))
        centers = centers.at[i].set(cands[best])
        min_d2 = lax.dynamic_index_in_dim(nd, best, axis=1, keepdims=False)
        return centers, min_d2

    centers, _ = lax.fori_loop(1, k, step, (centers, min_d2))

    wsum = jnp.maximum(jnp.sum(flatw), 1.0)
    mean = jnp.sum(flatp * flatw[:, None], axis=0) / wsum
    var = jnp.sum(((flatp - mean) ** 2) * flatw[:, None], axis=0) / wsum
    tol = 1e-4 * jnp.mean(var) * k
    return _lloyd(pts, w, centers, max_iter, tol)


@functools.partial(jax.jit, static_argnames=())
def assign_labels(points: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Nearest-center label for each point (blocked, MXU). (N,) int32.

    Blocked lax.map keeps the distance tile VMEM-resident; the one-shot
    (N, K) variant measured 7x slower on v5e (HBM-resident intermediate).
    """
    n, d = points.shape
    c = centers.astype(jnp.float32)
    pts, w = _pad_points(points.astype(jnp.float32), jnp.ones((n,), jnp.float32))

    def block(pb_wb):
        pb, _ = pb_wb
        return jnp.argmin(_pairwise_d2(pb, c), axis=1).astype(jnp.int32)

    return lax.map(block, (pts, w)).reshape(-1)[:n]


def map_to_centers(labels: jnp.ndarray, centers_u8: jnp.ndarray) -> jnp.ndarray:
    """centers_u8[labels] without a gather: one-hot matmul on the MXU.

    TPU gathers over millions of rows are latency killers (~100 ms at 2M);
    a (N, K) one-hot times (K, 3) matmul is bandwidth-bound and exact for
    uint8 payloads.
    """
    k = centers_u8.shape[0]
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    mapped = lax.dot_general(onehot, centers_u8.astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             precision=lax.Precision.HIGHEST)
    return jnp.clip(jnp.round(mapped), 0, 255).astype(jnp.uint8)
