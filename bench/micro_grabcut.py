"""Config-4 grabcut attribution: where does the ~1.2 s/crop go?

baseline_configs config 4 measures `apply_grabcut` (compat, reference
grabcut.py:9 contract) at ~0.63 MP/s on 1024x768 crops. The call is a host
loop of per-iteration jitted dispatches (solvers/grabcut.grabcut_core) plus
the split-merge polish, whose acceptance tests force host syncs. This
script breaks a warm call down on-chip:

  ingest     H2D of the u8 image
  init       _grabcut_init (kmeans-seeded GMMs)
  em         10x _grabcut_iter enqueued back-to-back, ONE block at the end
             (async dispatch should overlap; a per-iter block variant is
             timed too, to expose the tunnel round-trip cost)
  polish     _splitmerge_polish (candidate rounds + exact-energy accepts)

    python bench/micro_grabcut.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from helpers.corpus import load_corpus
    from image_segmenter_tpu.solvers import grabcut as G
    from image_segmenter_tpu.compat.grabcut import apply_grabcut

    print(f"[micro_grabcut] backend={jax.default_backend()}", file=sys.stderr)

    (name, rgb), = load_corpus(size=1024, limit=1)
    rgb = rgb[:, 128:896]
    bgr = rgb[:, :, ::-1].copy()
    h, w = bgr.shape[:2]
    rect = (w // 8, h // 12, w * 3 // 4, h * 9 // 10)

    # the compat rect-init mask (hard BGD outside, PR_FGD inside — exactly
    # compat/grabcut.py:43-46 / cv2 GC_INIT_WITH_RECT semantics, so the
    # stage breakdown profiles the same problem warm_apply_s runs)
    x, y, rw, rh = rect
    init_mask = np.full((h, w), G.BGD, np.uint8)
    init_mask[y:y + rh, x:x + rw] = G.PR_FGD

    def fence(arr):
        """Block AND force a small host transfer: block_until_ready alone
        under-reports over the axon tunnel (CLAUDE.md)."""
        jax.block_until_ready(arr)
        np.asarray(jax.tree_util.tree_leaves(arr)[0]).ravel()[:1]

    # Warm all programs once (compile)
    t0 = time.perf_counter()
    apply_grabcut(bgr, rect_xywh=rect, iterations=10)
    print(f"[micro_grabcut] cold apply_grabcut {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    rec: dict = {"shape": [h, w]}

    # whole warm call, 3 reps
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        apply_grabcut(bgr, rect_xywh=rect, iterations=10)
        times.append(time.perf_counter() - t0)
    rec["warm_apply_s"] = round(min(times), 4)
    # per-stage attribution the solver records itself (VERDICT r4 item 4)
    rec["last_solve_info"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in G.LAST_SOLVE_INFO.items()}

    # stage breakdown (re-timed standalone; fence = block + host transfer)
    t0 = time.perf_counter()
    img = jnp.asarray(bgr)
    m0 = jnp.asarray(init_mask)
    fence(img)
    rec["ingest_s"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    fg, bg = G._grabcut_init(img, m0)
    fence(fg.means)
    rec["init_s"] = round(time.perf_counter() - t0, 4)

    # EM loop: enqueue all 10, block once
    t0 = time.perf_counter()
    mask, fgg, bgg, yy = m0, fg, bg, None
    for _ in range(10):
        mask, fgg, bgg, yy, _ = G._grabcut_iter(img, mask, fgg, bgg, yy)
    fence(mask)
    rec["em10_async_s"] = round(time.perf_counter() - t0, 4)

    # EM loop: block every iteration (exposes per-dispatch round trip)
    t0 = time.perf_counter()
    mask_b, fgb, bgb, yb = m0, fg, bg, None
    for _ in range(10):
        mask_b, fgb, bgb, yb, _ = G._grabcut_iter(img, mask_b, fgb, bgb, yb)
        fence(mask_b)
    rec["em10_sync_s"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    polished = G._splitmerge_polish(img, mask, fgg, bgg, yy)
    fence(polished)
    rec["polish_s"] = round(time.perf_counter() - t0, 4)

    rec["stages_sum_s"] = round(
        rec["ingest_s"] + rec["init_s"] + rec["em10_async_s"]
        + rec["polish_s"], 4)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
