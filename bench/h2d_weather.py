"""10-second H2D tunnel weather probe: prints the current host->device
transfer rate so streaming benchmarks (bench.py, baseline_configs.py) can
be scheduled into good windows.

The streaming headline is transfer-bound (BENCH_NOTES: axon H2D defect
pins ~0.07 GB/s after the first big-input execution; on top of that the
tunnel's bulk rate swings ~3x by the hour — 2026-08-18 measured ~30 MB/s
mid-day vs ~90 MB/s in the round-2 capture window). A probe result well
below 0.08 GB/s means a bench re-run now would undersell the code.

    python bench/h2d_weather.py [MB]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    x = np.random.default_rng(0).integers(
        0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
    rates = []
    for i in range(4):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        rates.append(mb / 1024 / dt)
        del d
    best = max(rates)
    print(f"h2d: {['%.3f' % r for r in rates]} GB/s (best {best:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
