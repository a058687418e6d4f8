"""Per-iteration floor of the config-3 hsv_clustering k-means fit.

The round-5 attribution pinned hsv_clustering's t_fit at ~2.31 s over
8.29M weighted-HSV points (k=16, n_init=10 -> the merged-column batched
Lloyd, solvers/kmeans._lloyd_batched). This measures where that goes:

1. the shipped fit end-to-end (kmeans_fit, batched restarts);
2. ONE batched-Lloyd iteration standalone (the assign_stats + update body
   at the same (N, R*k) shape) -> per-iteration cost and the implied
   lock-step iteration count;
3. XLA cost analysis of the one-iteration program (bytes accessed) vs the
   ~100 MB/iter a fully-fused pass would read -> how much of the
   per-iteration time is materialized (N, R*k) intermediates (d2 /
   one-hot), i.e. the headroom a Pallas fused assign+stats kernel buys.

Timing fences with a host transfer (CLAUDE.md: block_until_ready alone
under-reports over the axon tunnel).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def fence(x):
    jax.block_until_ready(x)
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
        127 + 100 * np.cos(xx / 131.0),
        127 + 100 * np.sin((xx + yy) / 173.0),
    ], axis=-1)
    return np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)


def main():
    from image_segmenter_tpu.solvers import kmeans as KM
    from image_segmenter_tpu.ops import color as C

    print(f"backend={jax.default_backend()}", flush=True)

    rgb = photo(2160, 3840)
    x = jnp.asarray(rgb.reshape(-1, 3))
    hsv = C.rgb_u8_to_hsv_cv(x)
    hsv_n = jnp.stack(
        [hsv[..., 0] / 179.0 * 2.0, hsv[..., 1] / 255.0 * 1.5,
         hsv[..., 2] / 255.0], axis=-1)
    v = hsv[..., 2]
    wts = (v > 30).astype(jnp.float32)
    hsv_n, wts = map(jax.device_put, (hsv_n, wts))
    fence(hsv_n); fence(wts)
    n = hsv_n.shape[0]
    k, R = 16, 10
    print(f"n={n} k={k} R={R}", flush=True)

    # 1. shipped fit end-to-end
    fit = jax.jit(lambda p, ww: KM.kmeans_fit(p, ww, k, n_init=R).centers)
    out = fit(hsv_n, wts); fence(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit(hsv_n, wts); fence(out)
        times.append(time.perf_counter() - t0)
    t_full = min(times)
    print(f"kmeans_fit end-to-end: {t_full*1e3:.0f} ms", flush=True)

    # 2. one batched-Lloyd iteration standalone (same math as
    #    _lloyd_batched.assign_stats + the center update, fixed centers)
    pts, w = KM._pad_points(jnp.asarray(hsv_n, jnp.float32), wts)
    nb, B, d = pts.shape
    rng = np.random.default_rng(1)
    call0 = jnp.asarray(rng.random((R, k, d)), jnp.float32)

    @jax.jit
    def one_iter(call, pts, w):
        cflat = call.reshape(R * k, d)

        def block(carry, pb_wb):
            sums, counts, inertia = carry
            pb, wb = pb_wb
            d2 = KM._pairwise_d2(pb, cflat).reshape(-1, R, k)
            lbl = jnp.argmin(d2, axis=2)
            onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32)
                      * wb[:, None, None])
            sums = sums + jnp.sum(onehot[..., None] * pb[:, None, None, :],
                                  axis=0)
            counts = counts + jnp.sum(onehot, axis=0)
            inertia = inertia + jnp.sum(jnp.min(d2, axis=2) * wb[:, None],
                                        axis=0)
            return (sums, counts, inertia), None

        init = (jnp.zeros((R, k, d), jnp.float32),
                jnp.zeros((R, k), jnp.float32), jnp.zeros((R,), jnp.float32))
        (sums, counts, inertia), _ = lax.scan(block, init, (pts, w))
        new = jnp.where(counts[..., None] > 0,
                        sums / jnp.maximum(counts, 1.0)[..., None], call)
        return new, inertia

    out2 = one_iter(call0, pts, w); fence(out2[0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out2 = one_iter(call0, pts, w); fence(out2[0])
        times.append(time.perf_counter() - t0)
    t_iter = min(times)
    print(f"one batched-Lloyd iteration: {t_iter*1e3:.1f} ms "
          f"(implied lock-step iters ~= {t_full/t_iter:.0f})", flush=True)

    # 3. XLA cost analysis of the one-iteration program
    ca = jax.jit(one_iter).lower(call0, pts, w).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ba = ca.get("bytes accessed", float("nan"))
    pts_bytes = pts.size * 4 + w.size * 4
    print(f"one-iter bytes accessed (XLA): {ba/1e9:.2f} GB "
          f"(fully-fused floor = points+weights = {pts_bytes/1e9:.2f} GB; "
          f"HBM stream 293.6 GB/s -> floor {pts_bytes/293.6e9*1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
