"""u2netp CNN-stage roofline: is batch-to-channel packing worth anything?

VERDICT r3 item 7: u2netp's 16-wide mid channels fill 1/8 of the 128-lane
MXU; round 2 bounded the opportunity at ~10 ms of the 70.3 ms FULL
pipeline. This experiment decides it with measurements instead of the
bound:

1. XLA cost analysis (flops + bytes accessed) of the jitted u2netp forward
   at the product shape (320x320, b=4, bf16).
2. Measured amortized time (10 forwards in one dispatch, host-transfer
   timed — block_until_ready under-reports through the tunnel).
3. Achieved TFLOP/s and GB/s vs this chip's measured envelopes
   (bench/chip_envelope.py independent-op protocol: ~27.7 TFLOP/s matmul,
   ~293.6 GB/s HBM stream).

If the stage already sits at one of the envelopes, packing cannot help and
the item closes as a measured negative. A positive would need BOTH
utilizations well below their ceilings (then the limiter is MXU underfill,
which packing addresses).

    python bench/micro_u2netp_pack.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

# Chip envelopes from bench/chip_envelope.py's independent-op protocol
# (round 3 re-measurement). The round-1 BENCH_NOTES numbers (5.1 TFLOP/s /
# 52 GB/s) were fori-loop dependency-chain LATENCY artifacts ~5x too low;
# judging utilization against them biases toward false "no headroom".
# Override from a fresh run: ENVELOPE_JSON='{"matmul_bf16_tflops":..,
# "hbm_stream_gbs":..}' python bench/micro_u2netp_pack.py
_env = json.loads(os.environ.get("ENVELOPE_JSON", "{}"))
MEASURED_TFLOPS = float(_env.get("matmul_bf16_tflops", 27.7))
MEASURED_GBS = float(_env.get("hbm_stream_gbs", 293.6))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_segmenter_tpu.models.registry import Session

    print(f"[u2netp_pack] backend={jax.default_backend()}", file=sys.stderr)
    sess = Session("u2netp", half=True)
    b, (nh, nw) = 4, sess.spec.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, nh, nw, 3)).astype(np.float32))

    def fwd(v, x):
        outs = sess.module.apply(v, x, train=False)
        return outs[0]

    @jax.jit
    def fwd10(v, x):
        def body(_, acc):
            return acc + fwd(v, x)
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((b, nh, nw, 1),
                                                        jnp.float32))

    lowered = jax.jit(fwd).lower(sess.variables, x)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    print(f"[u2netp_pack] cost analysis: {flops / 1e9:.2f} GFLOP, "
          f"{bytes_acc / 1e6:.1f} MB accessed per forward (b={b})",
          file=sys.stderr)

    y = fwd10(sess.variables, x)
    np.asarray(y)  # warm + force full transfer
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fwd10(sess.variables, x))
        times.append((time.perf_counter() - t0) / 10)
    t = min(times)
    tflops = flops / t / 1e12
    gbs = bytes_acc / t / 1e9
    util_mxu = tflops / MEASURED_TFLOPS
    util_hbm = gbs / MEASURED_GBS
    print(f"[u2netp_pack] measured {t * 1e3:.2f} ms/forward -> "
          f"{tflops:.2f} TFLOP/s ({util_mxu:.0%} of matmul envelope), "
          f"{gbs:.1f} GB/s ({util_hbm:.0%} of HBM envelope)",
          file=sys.stderr)

    verdict = ("packing-cannot-help" if max(util_mxu, util_hbm) > 0.7
               else "headroom-exists")
    print(json.dumps({
        "shape": [b, nh, nw, 3],
        "gflop_per_fwd": round(flops / 1e9, 2),
        "mb_accessed_per_fwd": round(bytes_acc / 1e6, 1),
        "ms_per_fwd": round(t * 1e3, 2),
        "tflops": round(tflops, 2),
        "gbs": round(gbs, 1),
        "util_vs_matmul_envelope": round(util_mxu, 3),
        "util_vs_hbm_envelope": round(util_hbm, 3),
        "verdict": verdict,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
