"""Microbench: CG matvec — XLA shift-stencil vs the fused Pallas kernel.

Round-2 history (BENCH_NOTES): a first Pallas matvec (kernels/
pallas_matting.py, which RECOMPUTES mu/n in VMEM) measured 0.753 ms vs
XLA's then-0.683 at 576x1024 b=1 — a negative. Round 3 then cut the XLA
path to ~0.32 ms/image (separable boxes, pad hoist, one matvec/iter), and
round 4's kernels/pallas_matvec.py differs from the round-2 kernel: it
READS the precomputed mu/n planes (13-plane stack, no recompute) and runs
the radius-1 two-level halo in one pass. This decides whether the new
kernel ships or joins the measured negatives.

Protocol: 50 matvecs amortized in one dispatch (fori_loop with the output
fed back in so nothing is dead-code-eliminated), host-transfer timed.

    python bench/micro_matvec.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(label, fn, *args, inner=50, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        # force a SMALL host transfer (block_until_ready under-reports
        # through the tunnel; a full-array D2H would add ~ms of noise)
        np.asarray(fn(*args)[0, :1, :8])
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{label:40s} {best * 1e3:8.3f} ms/matvec", flush=True)
    return best


def main():
    from image_segmenter_tpu.solvers import matting as M
    from image_segmenter_tpu.kernels import pallas_matvec as K

    h, w = 576, 1024
    rng = np.random.default_rng(0)

    def setup(b):
        imgs = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
        ps = jnp.asarray(rng.standard_normal((b, h, w)).astype(np.float32))
        pres = jax.vmap(
            lambda im: M._precompute(im, 1e-7, 1, half_stats=True))(imgs)
        stacks = jax.vmap(K.build_matvec_stack)(
            pres.image, pres.valid_n, pres.mu, pres.dinv)
        return pres, stacks, ps

    for b in (1, 4):
        pres, stacks, ps = setup(b)

        @jax.jit
        def xla50(pres, p):
            def body(_, q):
                y = jax.vmap(lambda pr, q1: M._matvec(pr, q1, 1))(pres, q)
                return q + 1e-6 * y  # feed back: no DCE, stays bounded
            return jax.lax.fori_loop(0, 50, body, p)

        @jax.jit
        def pal50(stacks, p):
            def body(_, q):
                y = jax.vmap(K.matvec_planes)(stacks, q)
                return q + 1e-6 * y
            return jax.lax.fori_loop(0, 50, body, p)

        a = timed(f"XLA shift-stencil b={b}", xla50, pres, ps)
        c = timed(f"Pallas fused (T={K._TILE}) b={b}", pal50, stacks, ps)
        ref = np.asarray(xla50(pres, ps))
        out = np.asarray(pal50(stacks, ps))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-30)
        print(f"   50-iter drift pallas-vs-xla rel={rel:.2e} "
              f"speedup={a / c:.2f}x", flush=True)

    # BlockSpec-pipelined tiled variant (pre-overlapped tiles): sweep T
    pres, stacks, ps = setup(4)
    for tile in (16, 32, 64):
        if (h % tile):
            continue
        K._TILE = tile
        stacks_r = jax.vmap(K.build_matvec_stack)(
            pres.image, pres.valid_n, pres.mu, pres.dinv)
        st_t = jax.vmap(K.tile_stack)(stacks_r)

        @jax.jit
        def pal50p(st_t, p):
            def body(_, q):
                y = jax.vmap(K.matvec_planes_tiled)(st_t, q)
                return q + 1e-6 * y
            return jax.lax.fori_loop(0, 50, body, p)

        try:
            timed(f"Pallas TILED-pipelined (T={tile}) b=4", pal50p, st_t, ps)
        except Exception as e:
            print(f"tiled T={tile} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    K._TILE = 16

    # manual-DMA tile sweep at b=4
    for tile in (32, 64):
        if (h % tile):
            continue
        K._TILE = tile
        stacks_t = jax.vmap(K.build_matvec_stack)(
            pres.image, pres.valid_n, pres.mu, pres.dinv)

        @jax.jit
        def pal50t(stacks, p):
            def body(_, q):
                y = jax.vmap(K.matvec_planes)(stacks, q)
                return q + 1e-6 * y
            return jax.lax.fori_loop(0, 50, body, p)

        try:
            timed(f"Pallas fused (T={tile}) b=4", pal50t, stacks_t, ps)
        except Exception as e:
            print(f"T={tile} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    K._TILE = 16


if __name__ == "__main__":
    main()
