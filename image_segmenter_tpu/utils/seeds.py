"""GrabCut seed synthesis from brush strokes + crop rect (headless).

The workflow logic of MainWindow._on_run_grabcut (main_window.py:243-374)
without Qt: turn a user stroke mask {0,1,2} and an optional crop rect into
the (bgr_roi, rect_xywh, init_mask) arguments for apply_grabcut, with the
reference's include-bbox dilation heuristics, then composite the result back
onto the full canvas.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from image_segmenter_tpu.compat.grabcut import apply_grabcut
from image_segmenter_tpu.utils.qt_image import composite_foreground_over_transparent


def _bbox_of(mask: np.ndarray, value: int) -> Optional[Tuple[int, int, int, int]]:
    rows, cols = np.where(mask == value)
    if rows.size == 0:
        return None
    return (int(cols.min()), int(rows.min()),
            int(cols.max() - cols.min() + 1), int(rows.max() - rows.min() + 1))


def _expanded_bbox(bbox, w, h, margin):
    sx, sy, sw, sh = bbox
    sx = max(0, sx - margin)
    sy = max(0, sy - margin)
    sw = min(w - sx, sw + 2 * margin)
    sh = min(h - sy, sh + 2 * margin)
    return sx, sy, sw, sh


def grabcut_seeds(
    shape_hw: Tuple[int, int],
    user_mask: Optional[np.ndarray],
    rect_xywh: Optional[Tuple[int, int, int, int]] = None,
):
    """Build GrabCut init arguments from strokes (main_window.py:256-361).

    Returns (roi_xywh, rect_seed, init_mask) where roi_xywh is the clamped
    crop region to run on, and exactly one of rect_seed / init_mask is
    non-None — or (None, None, None) when there is nothing to seed with
    (the reference shows "Add Include marks or set a Crop rectangle first").
    """
    h_full, w_full = shape_hw
    if rect_xywh is not None:
        rx, ry, rw, rh = rect_xywh
        rx = max(0, min(rx, w_full - 1))
        ry = max(0, min(ry, h_full - 1))
        rw = max(1, min(rw, w_full - rx))
        rh = max(1, min(rh, h_full - ry))
        roi = (rx, ry, rw, rh)
        um = user_mask[ry:ry + rh, rx:rx + rw] if user_mask is not None else None
        init_mask = None
        if um is not None and ((um == 1).any() or (um == 2).any()):
            init_mask = np.zeros((rh, rw), dtype=np.uint8)
            init_mask[um == 1] = 3  # PR_FGD
            init_mask[um == 2] = 2  # PR_BGD
            bbox = _bbox_of(um, 1)
            if bbox is not None:
                margin = max(5, min(rw, rh) // 20)
                sx, sy, sw, sh = _expanded_bbox(bbox, rw, rh, margin)
                init_mask[sy:sy + sh, sx:sx + sw] = 3
        if init_mask is not None and (init_mask == 3).any():
            return roi, None, init_mask
        # rect seeding from include bbox, else inset ROI
        seed_rect = None
        if um is not None:
            bbox = _bbox_of(um, 1)
            if bbox is not None:
                margin = max(2, min(rw, rh) // 20)
                sx, sy, sw, sh = _expanded_bbox(bbox, rw, rh, margin)
                seed_rect = (sx, sy, max(1, sw), max(1, sh))
        if seed_rect is None:
            seed_rect = (1, 1, max(1, rw - 2), max(1, rh - 2))
        return roi, seed_rect, None

    # full image
    roi = (0, 0, w_full, h_full)
    if user_mask is None or not (user_mask != 0).any():
        return None, None, None
    init_mask = np.zeros((h_full, w_full), dtype=np.uint8)
    init_mask[user_mask == 1] = 3
    init_mask[user_mask == 2] = 2
    bbox = _bbox_of(user_mask, 1)
    if bbox is not None:
        margin = max(10, min(w_full, h_full) // 20)
        sx, sy, sw, sh = _expanded_bbox(bbox, w_full, h_full, margin)
        init_mask[sy:sy + sh, sx:sx + sw] = 3
    if (init_mask == 3).any():
        return roi, None, init_mask
    bbox = _bbox_of(user_mask, 1)
    if bbox is not None:
        margin = max(2, min(w_full, h_full) // 20)
        sx, sy, sw, sh = _expanded_bbox(bbox, w_full, h_full, margin)
        return roi, (sx, sy, max(1, sw), max(1, sh)), None
    return None, None, None


def run_grabcut_workflow(
    bgr_full: np.ndarray,
    user_mask: Optional[np.ndarray] = None,
    rect_xywh: Optional[Tuple[int, int, int, int]] = None,
    iterations: int = 10,
) -> Optional[np.ndarray]:
    """Full _on_run_grabcut flow: seeds -> apply_grabcut -> RGBA composite.

    Returns the RGBA cutout over transparency, or None when unseeded
    (main_window.py:363-371).
    """
    h_full, w_full = bgr_full.shape[:2]
    roi, seed_rect, init_mask = grabcut_seeds((h_full, w_full), user_mask, rect_xywh)
    if roi is None:
        return None
    rx, ry, rw, rh = roi
    bgr = bgr_full[ry:ry + rh, rx:rx + rw]
    gc_roi = apply_grabcut(bgr, rect_xywh=seed_rect, init_mask=init_mask,
                           iterations=iterations)
    gc_mask = np.zeros((h_full, w_full), dtype=np.uint8)
    gc_mask[ry:ry + rh, rx:rx + rw] = gc_roi
    fg01 = ((gc_mask == 1) | (gc_mask == 3)).astype(np.uint8)
    return composite_foreground_over_transparent(bgr_full, fg01)
