"""Working-image GrabCut mask evidence (VERDICT r4 item 2).

The round-4 split-merge polish wins the energy race on the parity sweep's
working-image scene (ours ~-9.3% vs cv2) but the returned mask overlaps
cv2's by only IoU ~0.43. This artifact shows WHAT the lower-energy mask is:

- saves the mask pair and image overlays as PNGs
  (bench/masks/working_image_{ours,cv2,overlay}.png);
- classifies each mask's structure: connected-component count, largest-
  component share of the foreground, compactness (perimeter^2 / 4*pi*area —
  1.0 for a disk, large for speckle);
- records which image regions the two masks actually select (mean color of
  the FG), so "coherent alternative region vs speckle" is decided from
  measured structure, not eyeballs;
- writes bench/working_image_masks.json with the verdict inputs.

Same scene construction as bench/grabcut_parity.py (96x96 center square,
rect=(8,8,w-16,h-16), 10 iterations). CPU-forced — cv2 is the baseline.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2 as cv
import numpy as np
import jax.numpy as jnp


def mask_structure(fg: np.ndarray) -> dict:
    """Structural classification of a binary FG mask."""
    n, labels, stats, _ = cv.connectedComponentsWithStats(
        fg.astype(np.uint8), connectivity=8)
    areas = sorted((int(stats[i, cv.CC_STAT_AREA]) for i in range(1, n)),
                   reverse=True)
    total = int(fg.sum())
    contours, _ = cv.findContours(fg.astype(np.uint8), cv.RETR_EXTERNAL,
                                  cv.CHAIN_APPROX_NONE)
    perim = sum(cv.arcLength(c, True) for c in contours)
    compact = float(perim**2 / (4.0 * np.pi * max(total, 1)))
    return {
        "fg_px": total,
        "n_components": len(areas),
        "largest_component_frac": (areas[0] / total) if total else 0.0,
        "compactness": round(compact, 2),
    }


def main():
    from helpers.corpus import load_corpus
    from image_segmenter_tpu.solvers import grabcut as GC
    from processing.grabcut import apply_grabcut

    rgb = dict(load_corpus(size=96))["working_image"]
    img = rgb[:, :, ::-1].copy()  # BGR
    h, w = img.shape[:2]
    rect = (8, 8, w - 16, h - 16)

    ours = apply_grabcut(img, rect_xywh=rect, iterations=10)
    fg_ours = ((ours == 1) | (ours == 3))
    ref_mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65))
    fgd = np.zeros((1, 65))
    cv.grabCut(img, ref_mask, rect, bgd, fgd, 10, cv.GC_INIT_WITH_RECT)
    fg_cv2 = ((ref_mask == 1) | (ref_mask == 3))

    e_ours = float(GC.mask_energy(jnp.asarray(img),
                                  jnp.asarray(fg_ours, jnp.float32)))
    e_cv2 = float(GC.mask_energy(jnp.asarray(img),
                                 jnp.asarray(fg_cv2, jnp.float32)))
    iou = float((fg_ours & fg_cv2).sum() / max((fg_ours | fg_cv2).sum(), 1))

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "masks")
    os.makedirs(outdir, exist_ok=True)
    cv.imwrite(os.path.join(outdir, "working_image_ours.png"),
               fg_ours.astype(np.uint8) * 255)
    cv.imwrite(os.path.join(outdir, "working_image_cv2.png"),
               fg_cv2.astype(np.uint8) * 255)
    # overlay: ours-only red, cv2-only blue, agreement green, over the image
    overlay = img.copy()
    overlay[fg_ours & ~fg_cv2] = (0, 0, 255)
    overlay[fg_cv2 & ~fg_ours] = (255, 0, 0)
    overlay[fg_ours & fg_cv2] = (0, 255, 0)
    cv.imwrite(os.path.join(outdir, "working_image_overlay.png"),
               cv.addWeighted(img, 0.45, overlay, 0.55, 0))

    s_ours = mask_structure(fg_ours)
    s_cv2 = mask_structure(fg_cv2)
    for s, fg in ((s_ours, fg_ours), (s_cv2, fg_cv2)):
        s["fg_mean_bgr"] = [round(float(c), 1)
                            for c in img[fg].mean(axis=0)] if fg.any() else None
    # subset-ness: ours excluding a coherent sub-region of cv2's mask (e.g.
    # the shadowed chest) is an alternative segmentation; ours scattered
    # OUTSIDE cv2's would be speckle.
    s_ours["frac_inside_cv2"] = round(
        float((fg_ours & fg_cv2).sum() / max(fg_ours.sum(), 1)), 4)

    # speckle test: a mask is coherent when one dominant component carries
    # most of the foreground and the boundary is not pathological; a few
    # tiny same-color satellites (<5% each) do not make it speckle.
    def coherent(s):
        return s["largest_component_frac"] >= 0.5 and s["compactness"] <= 40

    out = {
        "scene": "working_image(96x96, rect)",
        "iou": round(iou, 4),
        "e_ours": round(e_ours, 1),
        "e_cv2": round(e_cv2, 1),
        "rel_energy_win": round((e_cv2 - e_ours) / abs(e_cv2), 4),
        "ours": s_ours,
        "cv2": s_cv2,
        "ours_coherent": coherent(s_ours),
        "cv2_coherent": coherent(s_cv2),
        "pngs": sorted(os.listdir(outdir)),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "working_image_masks.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
