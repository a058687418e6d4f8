"""Re-measure this chip's compute/bandwidth envelopes with a clean protocol.

Round 1 measured ~5.1 TFLOP/s matmul and ~52 GB/s effective HBM via
fori_loop-amortized microbenches and recorded them as the chip envelope
(BENCH_NOTES.md). Round 3's u2netp roofline probe then measured the CNN
forward at 27.7 TFLOP/s effective — 5.4x the recorded "envelope" — so the
round-1 numbers must be protocol artifacts, and every "at roofline, no
headroom" conclusion derived from them needs re-auditing.

Protocol here: N independent ops batched in ONE jitted call via a scanned
carry chain that forces sequential execution but touches DIFFERENT slices
(so XLA cannot elide work and each step still streams fresh memory), timed
with a full host transfer of a small reduction (block_until_ready
under-reports through the tunnel).

    python bench/chip_envelope.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_call(fn, *args, reps: int = 3) -> float:
    np.asarray(fn(*args))  # warm/compile + force transfer
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"[envelope] backend={jax.default_backend()}", file=sys.stderr)
    out = {}

    # ---- matmul peak: k independent 2048^3 bf16 and f32 matmuls ----------
    n, k = 2048, 32
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        a = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (k, n, n)), dt)
        b = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (k, n, n)), dt)

        @jax.jit
        def mm(a, b):
            # batched independent matmuls; single scalar comes back
            return jnp.einsum("bij,bjk->bik", a, b,
                              preferred_element_type=jnp.float32).sum()

        t = _time_call(mm, a, b)
        tflops = 2 * k * n**3 / t / 1e12
        out[f"matmul_{name}_tflops"] = round(tflops, 1)
        print(f"[envelope] matmul {name}: {k}x{n}^3 in {t * 1e3:.1f} ms "
              f"= {tflops:.1f} TFLOP/s", file=sys.stderr)

    # ---- HBM stream: big elementwise passes over fresh memory ------------
    mb = 512
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, mb << 20, dtype=np.uint8).view(np.float32))
    passes = 16

    @jax.jit
    def stream(x):
        # sequential dependent passes over the SAME big buffer: each pass
        # reads + writes `mb` MB; the carry dependency serializes them
        def body(_, acc):
            return acc * 1.0000001 + 0.5
        y = jax.lax.fori_loop(0, passes, body, x)
        return y.sum()

    t = _time_call(stream, x)
    gbs = passes * 2 * mb / 1024 / t
    out["hbm_stream_gbs"] = round(gbs, 1)
    print(f"[envelope] elementwise stream: {passes} passes x {mb} MB r+w in "
          f"{t * 1e3:.1f} ms = {gbs:.1f} GB/s", file=sys.stderr)

    # ---- copy variant: independent slabs, scan-accumulated ---------------
    slabs = 16
    xs = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (slabs, 64 << 20 >> 2)).astype(np.float32))  # 16 x 64 MB

    @jax.jit
    def reduce_slabs(xs):
        def body(c, row):
            return c + row.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    t = _time_call(reduce_slabs, xs)
    gbs = slabs * 64 / 1024 / t
    out["hbm_read_gbs"] = round(gbs, 1)
    print(f"[envelope] read-reduce: {slabs} x 64 MB in {t * 1e3:.1f} ms "
          f"= {gbs:.1f} GB/s", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
