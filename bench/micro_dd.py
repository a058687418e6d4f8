"""Microbench: the df32 (compensated double-float) matting rung's per-
iteration cost at the config-4 shape (1024x768 portrait crops).

baseline_configs round 4 recorded the dd rung at 2.44 s / 116 iterations
= 21 ms/iter at 0.8 MP — ~50x its VPU bound and ~15x the f32 matvec's
per-MP cost, so something structural is wrong (materialized hi/lo plane
pairs? per-iteration recomputation of loop invariants?). This prints the
measured s/iter and the top device-trace rows for ONE solve.

    python bench/micro_dd.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from image_segmenter_tpu.solvers.matting_dd import solve_alpha_cf_dd

    h, w = 768, 1024
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3))
    # trimap with a real unknown band
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.hypot(yy - h / 2, xx - w / 2)
    tri = np.where(d < h / 4, 1.0, np.where(d > h / 3, 0.0, 0.5))

    t0 = time.perf_counter()
    alpha, ok, it, res = solve_alpha_cf_dd(img, tri, epsilon=1e-7,
                                           max_iter=400, rtol=1e-7)
    ok = bool(ok)
    t_first = time.perf_counter() - t0
    print(f"first call (compile+run): {t_first:.1f}s ok={ok} "
          f"it={int(it)} res={float(res):.2e}", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        alpha, ok, it, res = solve_alpha_cf_dd(img, tri, epsilon=1e-7,
                                               max_iter=400, rtol=1e-7)
        bool(ok)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"solve: {t:.3f}s / {int(it)} iters = "
          f"{t / max(int(it), 1) * 1e3:.2f} ms/iter at {h}x{w}", flush=True)

    from image_segmenter_tpu.utils.profiling import capture_device_trace

    def one():
        a, ok, _, _ = solve_alpha_cf_dd(img, tri, epsilon=1e-7,
                                        max_iter=400, rtol=1e-7)
        bool(ok)

    rows = capture_device_trace(one, "/tmp/iseg_dd_trace")
    total = sum(r[1] for r in rows)
    print(f"device: {len(rows)} ops, {total / 1e3:.1f} ms total")
    for name, t_us, c in rows[:15]:
        print(f"  {t_us / 1e3:9.3f} ms x{c:<5d} {name}")


if __name__ == "__main__":
    main()
