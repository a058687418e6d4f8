"""In-device attribution of one pipeline batch via jax.profiler (ROADMAP
item 3): runs a 4K b=4 Pipeline batch under a profiler trace and prints the
device-lane fusion timings — the ground truth the stage-bisect profiler
(profile_stages.py) approximates from the host side.

Usage: python bench/device_trace.py [H W B]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax

    from image_segmenter_tpu.pipeline.segment import Pipeline
    from image_segmenter_tpu.utils.profiling import capture_device_trace

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
        127 + 100 * np.cos(xx / 131.0),
        127 + 100 * np.sin((xx + yy) / 173.0),
    ], axis=-1)
    img = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    imgs = np.broadcast_to(img, (b, h, w, 3)).copy()

    pipe = Pipeline(model="u2netp", k=16)
    out = pipe.run(imgs)  # compile + warm
    np.asarray(out.rgba[0, 0, 0])

    def one_batch():
        r = pipe.run(imgs)
        np.asarray(r.rgba[0, 0, 0])  # force a host transfer (tunnel timing)

    rows = capture_device_trace(one_batch, "/tmp/iseg_device_trace")
    total = sum(t for _, t, _ in rows)
    print(f"device events: {len(rows)} distinct ops, {total/1e3:.1f} ms total")
    for name, t, c in rows[:25]:
        print(f"  {t/1e3:9.3f} ms  x{c:<5d} {name[:90]}")

    # The long tail of small ops is where vmapped-CNN convs and loop
    # scaffolding hide; aggregate it by op-family so it's attributable.
    import re
    fam: dict[str, tuple[float, int]] = {}
    for name, t, c in rows:
        f = re.sub(r"[.\d]+$", "", name)
        ft, fc = fam.get(f, (0.0, 0))
        fam[f] = (ft + t, fc + c)
    print(f"\nby op family (top 20 of {len(fam)}):")
    for f, (t, c) in sorted(fam.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {t/1e3:9.3f} ms  x{c:<6d} {f[:80]}")


if __name__ == "__main__":
    main()
