"""Batched-Lloyd assign_stats restructuring candidates (config-3 t_fit).

micro_hsv_fit.py measured one batched-Lloyd iteration at 81.4 ms while XLA
counts only 0.38 GB accessed (1.3 ms of HBM) — the per-block reduction
scan carries (sums, counts, inertia) across 64 blocks, serializing the
iteration at per-step latency (the same dependency-chain trap the round-3
envelope re-measurement exposed in bench/chip_envelope.py). The reduction
does NOT need the carry: per-block partials are independent.

Variants at the hsv shape (8.29M pts, k=16, R=10):
  scan      the shipped carry-scan (baseline)
  map       lax.map of per-block partials (no carry) + final reduce
  oneshot   no blocking at all (one fused (N, R*k) expression)
  scan512k  the shipped scan at 4x block size (16 steps instead of 64)
  mxu*      sums via a (R*k, B) @ (B, d) HIGHEST-precision matmul instead
            of the (B, R, k, d) VPU broadcast-reduce — the round-5 first
            sweep showed ALL scan restructurings land at 74-87 ms, i.e.
            the bound is the VPU reduce, not the loop structure

Timing fences with a host transfer (CLAUDE.md).
"""

from __future__ import annotations

import os
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
         hsv[..., 2] / 255.0], axis=-1).astype(jnp.float32)
    wts = (hsv[..., 2] > 30).astype(jnp.float32)
    k, R = 16, 10
    rng = np.random.default_rng(1)
    call0 = jnp.asarray(rng.random((R, k, 3)), jnp.float32)

    def block_stats(cflat, pb, wb):
        d2 = KM._pairwise_d2(pb, cflat).reshape(-1, R, k)
        lbl = jnp.argmin(d2, axis=2)
        onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32)
                  * wb[:, None, None])
        sums = jnp.sum(onehot[..., None] * pb[:, None, None, :], axis=0)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(jnp.min(d2, axis=2) * wb[:, None], axis=0)
        return sums, counts, inertia

    def pad_to(block):
        n, d = hsv_n.shape
        nb = -(-n // block)
        pad = nb * block - n
        p = jnp.concatenate([hsv_n, jnp.zeros((pad, d), jnp.float32)])
        w = jnp.concatenate([wts, jnp.zeros((pad,), jnp.float32)])
        return p.reshape(nb, block, d), w.reshape(nb, block)

    variants = {}

    def v_scan(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)

            def step(carry, pb_wb):
                s, c, i = carry
                ds, dc, di = block_stats(cflat, *pb_wb)
                return (s + ds, c + dc, i + di), None

            init = (jnp.zeros((R, k, 3), jnp.float32),
                    jnp.zeros((R, k), jnp.float32),
                    jnp.zeros((R,), jnp.float32))
            (s, c, i), _ = lax.scan(step, init, (pts, w))
            return s, c, i

        return f, (pts, w)

    def v_map(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)
            s, c, i = lax.map(lambda pw: block_stats(cflat, *pw), (pts, w))
            return jnp.sum(s, 0), jnp.sum(c, 0), jnp.sum(i, 0)

        return f, (pts, w)

    def v_oneshot():
        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)
            return block_stats(cflat, pts, w)

        return f, (hsv_n, wts)

    def block_stats_mxu(cflat, pb, wb):
        d2 = KM._pairwise_d2(pb, cflat).reshape(-1, R, k)
        lbl = jnp.argmin(d2, axis=2)
        onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32)
                  * wb[:, None, None])
        # (R*k, B) @ (B, d) on the MXU. one-hot entries are bf16-exact, so
        # HIGHEST-precision synthesis gives exact products; only the f32
        # accumulation ORDER differs from the VPU reduce.
        sums = lax.dot_general(
            onehot.reshape(-1, R * k), pb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(R, k, 3)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(jnp.min(d2, axis=2) * wb[:, None], axis=0)
        return sums, counts, inertia

    def v_scan_mxu(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)

            def step(carry, pb_wb):
                s, c, i = carry
                ds, dc, di = block_stats_mxu(cflat, *pb_wb)
                return (s + ds, c + dc, i + di), None

            init = (jnp.zeros((R, k, 3), jnp.float32),
                    jnp.zeros((R, k), jnp.float32),
                    jnp.zeros((R,), jnp.float32))
            (s, c, i), _ = lax.scan(step, init, (pts, w))
            return s, c, i

        return f, (pts, w)

    def v_map_mxu(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)
            s, c, i = lax.map(lambda pw: block_stats_mxu(cflat, *pw),
                              (pts, w))
            return jnp.sum(s, 0), jnp.sum(c, 0), jnp.sum(i, 0)

        return f, (pts, w)

    def v_oneshot_mxu():
        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)
            return block_stats_mxu(cflat, pts, w)

        return f, (hsv_n, wts)

    def block_stats_flat(cflat, pb, wb):
        # Lane-width hypothesis: every op in the shipped block runs on
        # (B, R, k[, d]) tensors whose minor dim is 16 or 3 — 1/8 to 3/128
        # of the 128-lane VPU. Keeping the hot elementwise work on flat
        # (B, R*k=160) tensors (minor 160 -> 128+32 lanes) should recover
        # most of the width.
        d2f = KM._pairwise_d2(pb, cflat)                       # (B, R*k)
        d2 = d2f.reshape(-1, R, k)
        lbl = jnp.argmin(d2, axis=2)                           # (B, R)
        cols = jnp.arange(R * k, dtype=jnp.int32)
        ohf = ((jnp.take(lbl, cols // k, axis=1) == cols % k)
               .astype(jnp.float32) * wb[:, None])             # (B, R*k)
        sums = jnp.stack(
            [jnp.sum(ohf * pb[:, i:i + 1], axis=0) for i in range(3)],
            axis=-1).reshape(R, k, 3)
        counts = jnp.sum(ohf, axis=0).reshape(R, k)
        inertia = jnp.sum(jnp.min(d2, axis=2) * wb[:, None], axis=0)
        return sums, counts, inertia

    def v_scan_flat(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)

            def step(carry, pb_wb):
                s, c, i = carry
                ds, dc, di = block_stats_flat(cflat, *pb_wb)
                return (s + ds, c + dc, i + di), None

            init = (jnp.zeros((R, k, 3), jnp.float32),
                    jnp.zeros((R, k), jnp.float32),
                    jnp.zeros((R,), jnp.float32))
            (s, c, i), _ = lax.scan(step, init, (pts, w))
            return s, c, i

        return f, (pts, w)

    def v_oneshot_flat():
        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)
            return block_stats_flat(cflat, pts, w)

        return f, (hsv_n, wts)

    variants["scan128k (ships)"] = v_scan(1 << 17)
    variants["scan512k"] = v_scan(1 << 19)
    variants["map128k"] = v_map(1 << 17)
    variants["map512k"] = v_map(1 << 19)
    variants["oneshot"] = v_oneshot()
    variants["mxu_scan128k"] = v_scan_mxu(1 << 17)
    variants["mxu_scan512k"] = v_scan_mxu(1 << 19)
    variants["mxu_map128k"] = v_map_mxu(1 << 17)
    variants["mxu_oneshot"] = v_oneshot_mxu()
    variants["flat_scan128k"] = v_scan_flat(1 << 17)
    variants["flat_scan512k"] = v_scan_flat(1 << 19)
    variants["flat_oneshot"] = v_oneshot_flat()

    # Every variant above shares _pairwise_d2's HIGHEST-precision matmul:
    # (B, 3) @ (3, 160) pads the contracting dim 3 -> 128 on the MXU and
    # then runs 6 bf16 synthesis passes — ~250x padded work. For d=3 an
    # elementwise (x - c)^2 expansion on the VPU is exact f32 and needs no
    # padding; these isolate whether d2 is the common ~75 ms floor.
    def d2_vpu(pb, cflat):
        diff0 = pb[:, 0:1] - cflat[None, :, 0]
        diff1 = pb[:, 1:2] - cflat[None, :, 1]
        diff2 = pb[:, 2:3] - cflat[None, :, 2]
        return diff0 * diff0 + diff1 * diff1 + diff2 * diff2  # (B, R*k)

    def block_stats_vpud2(cflat, pb, wb):
        d2 = d2_vpu(pb, cflat).reshape(-1, R, k)
        lbl = jnp.argmin(d2, axis=2)
        onehot = (jax.nn.one_hot(lbl, k, dtype=jnp.float32)
                  * wb[:, None, None])
        sums = jnp.sum(onehot[..., None] * pb[:, None, None, :], axis=0)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(jnp.min(d2, axis=2) * wb[:, None], axis=0)
        return sums, counts, inertia

    def v_scan_vpud2(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)

            def step(carry, pb_wb):
                s, c, i = carry
                ds, dc, di = block_stats_vpud2(cflat, *pb_wb)
                return (s + ds, c + dc, i + di), None

            init = (jnp.zeros((R, k, 3), jnp.float32),
                    jnp.zeros((R, k), jnp.float32),
                    jnp.zeros((R,), jnp.float32))
            (s, c, i), _ = lax.scan(step, init, (pts, w))
            return s, c, i

        return f, (pts, w)

    def block_stats_vpud2_flat(cflat, pb, wb):
        d2f = d2_vpu(pb, cflat)                                # (B, R*k)
        d2 = d2f.reshape(-1, R, k)
        lbl = jnp.argmin(d2, axis=2)
        cols = jnp.arange(R * k, dtype=jnp.int32)
        ohf = ((jnp.take(lbl, cols // k, axis=1) == cols % k)
               .astype(jnp.float32) * wb[:, None])             # (B, R*k)
        sums = jnp.stack(
            [jnp.sum(ohf * pb[:, i:i + 1], axis=0) for i in range(3)],
            axis=-1).reshape(R, k, 3)
        counts = jnp.sum(ohf, axis=0).reshape(R, k)
        inertia = jnp.sum(jnp.min(d2, axis=2) * wb[:, None], axis=0)
        return sums, counts, inertia

    def v_scan_vpud2_flat(block):
        pts, w = pad_to(block)

        @jax.jit
        def f(call, pts, w):
            cflat = call.reshape(R * k, 3)

            def step(carry, pb_wb):
                s, c, i = carry
                ds, dc, di = block_stats_vpud2_flat(cflat, *pb_wb)
                return (s + ds, c + dc, i + di), None

            init = (jnp.zeros((R, k, 3), jnp.float32),
                    jnp.zeros((R, k), jnp.float32),
                    jnp.zeros((R,), jnp.float32))
            (s, c, i), _ = lax.scan(step, init, (pts, w))
            return s, c, i

        return f, (pts, w)

    variants["vpud2_scan128k"] = v_scan_vpud2(1 << 17)
    variants["vpud2_flat_scan"] = v_scan_vpud2_flat(1 << 17)

    only = os.environ.get("VARIANTS")  # comma-separated substring filter
    if only:
        keys = [s.strip() for s in only.split(",")]
        variants = {n: v for n, v in variants.items()
                    if any(s in n for s in keys)}

    ref = None
    for name, (f, args) in variants.items():
        out = f(call0, *args)
        fence(out[0])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(call0, *args)
            fence(out[0])
            times.append(time.perf_counter() - t0)
        s = np.asarray(out[0])
        if ref is None:
            ref = s
        md = float(np.abs(s - ref).max())
        print(f"{name:18s}: {min(times)*1e3:7.1f} ms  (max|sums-ref|={md:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
