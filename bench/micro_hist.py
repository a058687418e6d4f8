"""Microbench: u8 histogram strategies at 8.3M elements on the real chip.

The Otsu stage profiled at 120 ms/batch because histogram_u8 sorts the full
plane. Candidates:
  A. sort + 256 searchsorted (round-1 implementation)
  B. fused compare-reduce: sum over pixels of (x == bin) with pixels chunked
  C. one-hot matmul on the MXU: ones @ onehot(x) per chunk
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:34s} {best * 1e3:8.3f} ms", flush=True)
    return out


def main():
    n = 2160 * 3840
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, n, dtype=np.uint8))

    @jax.jit
    def hist_sort(x):
        s = jnp.sort(x)
        edges = jnp.arange(256, dtype=jnp.uint8)
        left = jnp.searchsorted(s, edges, side="left")
        right = jnp.searchsorted(s, edges, side="right")
        return (right - left).astype(jnp.float32)

    @jax.jit
    def hist_cmp(x):
        bins = jnp.arange(256, dtype=jnp.int32)
        xx = x.astype(jnp.int32).reshape(-1, 512)

        def body(i, acc):
            chunk = jax.lax.dynamic_slice(xx, (i * 2048, 0), (2048, 512))
            return acc + jnp.sum(chunk.reshape(-1, 1) == bins[None, :], axis=0,
                                 dtype=jnp.int32)
        acc = jax.lax.fori_loop(0, xx.shape[0] // 2048, body,
                                jnp.zeros(256, jnp.int32))
        return acc.astype(jnp.float32)

    @jax.jit
    def hist_cmp_flat(x):
        bins = jnp.arange(256, dtype=jnp.int32)
        return jnp.sum(x.astype(jnp.int32)[:, None] == bins[None, :], axis=0,
                       dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def hist_mxu(x):
        bins = jnp.arange(256, dtype=jnp.float32)
        xx = x.astype(jnp.float32).reshape(-1, 2048)

        def body(i, acc):
            chunk = jax.lax.dynamic_slice(xx, (i * 512, 0), (512, 2048))
            onehot = (chunk.reshape(-1, 1) == bins[None, :]).astype(jnp.bfloat16)
            return acc + jnp.sum(onehot, axis=0, dtype=jnp.float32)
        acc = jax.lax.fori_loop(0, xx.shape[0] // 512, body,
                                jnp.zeros(256, jnp.float32))
        return acc

    ref = np.bincount(np.asarray(x), minlength=256).astype(np.float32)
    for label, fn in [("A sort+searchsorted", hist_sort),
                      ("B compare-reduce chunked", hist_cmp),
                      ("B2 compare-reduce flat", hist_cmp_flat),
                      ("C onehot-chunked", hist_mxu)]:
        out = timed(label, fn, x)
        err = np.abs(np.asarray(out) - ref).max()
        print(f"   max err vs bincount: {err}", flush=True)

    y = jnp.asarray(rng.integers(0, 256, (4, n), dtype=np.uint8))
    timed("B2 vmapped b4", jax.jit(jax.vmap(hist_cmp_flat)), y, reps=5)
    timed("A  vmapped b4", jax.jit(jax.vmap(hist_sort)), y, reps=5)

    # Pallas one-pass kernels (round 3: VPU compare-reduce at ~5.1 ms/33M =
    # its own compute bound; round 4: MXU joint-nibble factorization)
    from image_segmenter_tpu.kernels.pallas_histogram import hist256
    from functools import partial

    for impl in ("compare", "nibble"):
        out = timed(f"D pallas {impl} 8.3M", partial(hist256, impl=impl), x)
        err = np.abs(np.asarray(out) - ref).max()
        print(f"   max err vs bincount: {err}", flush=True)
        timed(f"D pallas {impl} vmapped b4",
              jax.jit(jax.vmap(partial(hist256, impl=impl))), y, reps=5)


if __name__ == "__main__":
    main()
