"""Sequential vs batched-restart Lloyd on the real chip (VERDICT r4 item 3).

The k-means restart fori_loop was the top remaining device bucket in the
FULL 4K b=4 lane (9.9 ms of 51.7, HLO while.107 with the nested Lloyd
while.149 at 4.0 ms). This measures `kmeans_fit(batch_restarts=...)` at the
two shapes that matter:

- pipeline shape: the in-pipeline sketch fit — (16384, 3) points, k=16,
  n_init=2, vmapped over b=4 images (exactly _kmeans16_quantize's call);
- compat shape: the synchronous color_simplify path — ~1M points (8 blocks
  of 131072), k=16, n_init=10.

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

from image_segmenter_tpu.solvers import kmeans as KM


def fence(x):
    jax.block_until_ready(x)
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def time_fn(fn, *args, reps=20):
    out = fn(*args)       # compile
    fence(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps * 1e3, out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # pipeline shape, vmapped b=4
    pts = jnp.asarray(rng.integers(0, 256, (4, 16384, 3)), jnp.float32)
    w = jnp.asarray(rng.random((4, 16384)) > 0.1, jnp.float32)
    for br in (False, True):
        fn = jax.jit(jax.vmap(lambda p, ww: KM.kmeans_fit(
            p, ww, 16, n_init=2, batch_restarts=br).centers))
        ms, out = time_fn(fn, pts, w)
        print(f"pipeline b=4 16k k=16 R=2  batch_restarts={br}: {ms:.2f} ms",
              flush=True)
    # what the pipeline actually ships since round 5: deterministic
    # stratified-greedy seeding + ONE Lloyd (no restarts, no PRNG)
    fn = jax.jit(jax.vmap(lambda p, ww: KM.kmeans_fit_det(
        p, ww, 16).centers))
    ms, out = time_fn(fn, pts, w)
    print(f"pipeline b=4 16k k=16 det (ships): {ms:.2f} ms", flush=True)

    # compat shape: 1M points, R=10
    n = 1 << 20
    pts1 = jnp.asarray(rng.integers(0, 256, (n, 3)), jnp.float32)
    w1 = jnp.ones((n,), jnp.float32)
    for br in (False, True):
        fn = jax.jit(lambda p, ww, _br=br: KM.kmeans_fit(
            p, ww, 16, n_init=10, batch_restarts=_br).centers)
        ms, out = time_fn(fn, pts1, w1, reps=5)
        print(f"compat 1M k=16 R=10       batch_restarts={br}: {ms:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
