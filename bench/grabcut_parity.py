"""GrabCut parity sweep vs cv2.grabCut: IoU distribution + energy cross-check.

VERDICT round-1 item 7: tighten GrabCut to IoU >= 0.99 or quantify why
0.97-0.99 is the energy-model floor. This sweep runs S structured scenes x
seeds x {rect, mask} inits plus the real-photo corpus, and for every case
records:

- IoU(ours, cv2) of the foreground masks;
- the GrabCut ENERGY of both masks evaluated under one common model: fit
  both GMMs to a mask's own partition (one EM step from the mask, exactly
  what both implementations do after the cut), then
  E(m) = sum_p -log p_side(p) + sum_{(p,q) cut} w_pq.
  If our mask's energy <= cv2's on the same scene, the optimizer found an
  equally good (or better) optimum and the IoU gap is benign multimodality
  of the objective, not a solver deficiency.

Writes bench/grabcut_parity.json. Runs on CPU (forced) — scenes are small
and cv2 is the baseline anyway.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2 as cv
import numpy as np
import jax.numpy as jnp


def _scene(rng, h=72, w=96, noise=12.0, fg_shift=140.0):
    img = np.zeros((h, w, 3), np.float64)
    img[...] = [40, 90, 160]
    img += rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    cy = h / 2 + rng.uniform(-h / 8, h / 8)
    cx = w / 2 + rng.uniform(-w / 8, w / 8)
    ry = h / rng.uniform(2.8, 3.8)
    rx = w / rng.uniform(2.8, 4.0)
    blob = ((yy - cy) ** 2 / ry**2 + (xx - cx) ** 2 / rx**2) < 1
    fg = np.clip(np.array([40, 90, 160]) + rng.uniform(-1, 1, 3) * fg_shift, 0, 255)
    img[blob] = fg.astype(np.uint8)
    img[blob] = np.clip(
        img[blob].astype(int) + rng.normal(0, noise, (blob.sum(), 3)), 0, 255
    )
    return np.clip(img, 0, 255).astype(np.uint8), blob


def _iou(a, b):
    return float((a & b).sum() / max((a | b).sum(), 1))


def _energy(img_bgr: np.ndarray, fg01: np.ndarray) -> float:
    """GrabCut energy of a hard segmentation under GMMs fit to its own
    partition (the model state both implementations hold after a cut).
    Delegates to the solver's standardized evaluator so the sweep scores
    masks with EXACTLY the protocol the split-merge polish selects by."""
    from image_segmenter_tpu.solvers import grabcut as GC

    return float(GC.mask_energy(jnp.asarray(img_bgr),
                                jnp.asarray(fg01, jnp.float32)))


def run_case(img, rect=None, init_mask=None, iters=10):
    from processing.grabcut import apply_grabcut

    h, w = img.shape[:2]
    ours = apply_grabcut(img, rect_xywh=rect, init_mask=init_mask, iterations=iters)
    fg_ours = (ours == 1) | (ours == 3)

    ref_mask = np.zeros((h, w), np.uint8) if init_mask is None else init_mask.copy()
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    mode = cv.GC_INIT_WITH_RECT if rect is not None else cv.GC_INIT_WITH_MASK
    cv.grabCut(img, ref_mask, rect, bgd, fgd, iters, mode)
    fg_ref = (ref_mask == 1) | (ref_mask == 3)

    return {
        "iou": _iou(fg_ours, fg_ref),
        "e_ours": _energy(img, np.asarray(fg_ours)),
        "e_cv2": _energy(img, np.asarray(fg_ref)),
        # fg area fractions: a scene is "degenerate" when either solver's
        # foreground (or their union) is near-empty/near-full — there is no
        # statistical foreground and the optima are arbitrary; IoU there
        # reflects objective multimodality, not solver quality.
        "fg_frac_ours": float(np.asarray(fg_ours).mean()),
        "fg_frac_cv2": float(np.asarray(fg_ref).mean()),
    }


def main():
    n_scenes = int(os.environ.get("GC_SCENES", 12))
    records = []
    t0 = time.time()
    for s in range(n_scenes):
        rng = np.random.default_rng(1000 + s)
        noise = rng.uniform(6, 20)
        img, blob = _scene(rng, noise=noise)
        h, w = img.shape[:2]

        rec = run_case(img, rect=(8, 8, w - 16, h - 16))
        rec.update(scene=s, kind="rect", noise=round(noise, 1))
        records.append(rec)
        print(json.dumps(rec), flush=True)

        init = np.full((h, w), 2, np.uint8)
        init[blob] = 3
        init[:4, :] = 0
        cy, cx = h // 2, w // 2
        init[cy - 3 : cy + 3, cx - 3 : cx + 3] = 1
        rec = run_case(img, init_mask=init)
        rec.update(scene=s, kind="mask", noise=round(noise, 1))
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # real photos, rect init
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from helpers.corpus import load_corpus

    for name, rgb in load_corpus(size=96):
        img = rgb[:, :, ::-1].copy()  # BGR
        h, w = img.shape[:2]
        rec = run_case(img, rect=(8, 8, w - 16, h - 16))
        rec.update(scene=name, kind="photo-rect")
        records.append(rec)
        print(json.dumps(rec), flush=True)

    def _degenerate(r):
        lo, hi = 0.005, 0.995
        return (not (lo < r["fg_frac_ours"] < hi)) or (
            not (lo < r["fg_frac_cv2"] < hi))

    def _summarize(rs):
        if not rs:
            return {"n": 0}
        ious = np.array([r["iou"] for r in rs])
        e_gap = np.array([(r["e_ours"] - r["e_cv2"]) / max(abs(r["e_cv2"]), 1)
                          for r in rs])
        return {
            "n": len(rs),
            "iou_mean": float(ious.mean()),
            "iou_min": float(ious.min()),
            "iou_p10": float(np.percentile(ious, 10)),
            "frac_iou_ge_0.99": float((ious >= 0.99).mean()),
            "frac_energy_ours_le_cv2": float((e_gap <= 1e-4).mean()),
            "rel_energy_gap_mean": float(e_gap.mean()),
            # the per-scene acceptance contract: the optimizer either agrees
            # with cv2 (IoU) or beats it on the shared objective — IoU gaps
            # are then multimodality ties/wins, never energy losses.
            "frac_iou_or_energy_ok": float(
                ((ious >= 0.99) | (e_gap <= 1e-4)).mean()),
        }

    summary = _summarize(records)
    summary["elapsed_s"] = round(time.time() - t0, 1)
    # Split so the degenerate-scene tail (no statistical foreground; optima
    # arbitrary — see run_case) doesn't read as a solver failure.
    by_class = {}
    for kind in sorted({r["kind"] for r in records}):
        ks = [r for r in records if r["kind"] == kind]
        by_class[kind] = _summarize([r for r in ks if not _degenerate(r)])
        deg = [r for r in ks if _degenerate(r)]
        if deg:
            by_class[kind + "-degenerate"] = _summarize(deg)
    print(json.dumps(summary), flush=True)
    print(json.dumps(by_class), flush=True)
    out = {"summary": summary, "summary_by_class": by_class,
           "records": records}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "grabcut_parity.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
