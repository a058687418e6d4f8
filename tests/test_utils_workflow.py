"""Brush/preview/seed-synthesis utilities vs reference semantics."""

import numpy as np
import pytest

from image_segmenter_tpu.utils.brush import (
    apply_brush, paint_disk, process_alpha_for_preview)
from image_segmenter_tpu.utils.seeds import grabcut_seeds, run_grabcut_workflow


def test_paint_disk_clips():
    m = np.zeros((20, 20), np.uint8)
    paint_disk(m, 0, 0, 3, 1)  # clipped at corner
    assert m[0, 0] == 1 and m[3, 0] == 1 and m[4, 0] == 0
    paint_disk(m, 10, 10, 2, 2)
    assert m[10, 10] == 2 and m[10, 12] == 2 and m[10, 13] == 0


def test_apply_brush_stroke_interpolates():
    m = np.zeros((30, 60), np.uint8)
    apply_brush(m, (50, 15), "include", brush_size=8, last_pos=(5, 15))
    # a continuous band along the stroke, no gaps
    assert (m[15, 5:51] == 1).all()
    m2 = np.zeros((30, 60), np.uint8)
    apply_brush(m2, (10, 10), "exclude", brush_size=8)
    assert m2[10, 10] == 2
    apply_brush(m2, (10, 10), "erase", brush_size=8)
    assert m2[10, 10] == 0
    apply_brush(m2, (10, 10), "crop", brush_size=8)  # non-paint mode: no-op
    assert (m2 == 0).all()


def test_preview_threshold():
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 3] = [[0, 100, 128, 129]] * 4
    out = process_alpha_for_preview(rgba, 128)
    np.testing.assert_array_equal(out[0, :, 3], [0, 0, 0, 255])
    np.testing.assert_array_equal(rgba[0, :, 3], [0, 100, 128, 129])  # copy


def test_grabcut_seeds_mask_init():
    um = np.zeros((100, 120), np.uint8)
    um[40:50, 50:70] = 1  # include strokes
    um[5:10, 5:10] = 2
    roi, rect, init = grabcut_seeds((100, 120), um)
    assert roi == (0, 0, 120, 100) and rect is None
    # strokes present, bbox dilated by margin=max(10, min/20)=10
    assert (init[40:50, 50:70] == 3).all()
    assert init[30, 40] == 3  # inside dilated bbox
    assert init[5, 5] == 2    # exclude mark survives outside the bbox
    assert init[90, 110] == 0


def test_grabcut_seeds_roi_rect_fallback():
    # no strokes + crop rect -> inset ROI rect seed
    roi, rect, init = grabcut_seeds((100, 120), None, rect_xywh=(10, 10, 60, 50))
    assert roi == (10, 10, 60, 50)
    assert rect == (1, 1, 58, 48) and init is None
    # nothing at all -> unseeded
    assert grabcut_seeds((100, 120), None) == (None, None, None)


def test_run_grabcut_workflow(rng):
    h, w = 60, 80
    img = np.full((h, w, 3), (40, 90, 160), np.float64)
    img += rng.normal(0, 8, img.shape)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 30) ** 2 + (xx - 40) ** 2) < 15 ** 2
    img[blob] = [180, 120, 50]
    bgr = np.clip(img, 0, 255).astype(np.uint8)

    # stroke-seeded full-image path: parity with cv2 given identical seeds
    # (with unmarked pixels = known BGD, both may cut everything to BG)
    um = np.zeros((h, w), np.uint8)
    um[28:33, 38:43] = 1
    um[:3, :] = 2
    rgba = run_grabcut_workflow(bgr, um, iterations=5)
    assert rgba.shape == (h, w, 4)
    import cv2 as cv
    from image_segmenter_tpu.utils.seeds import grabcut_seeds as _seeds

    _, _, init = _seeds((h, w), um)
    ref_mask = init.copy()
    cv.grabCut(bgr, ref_mask, None, np.zeros((1, 65)), np.zeros((1, 65)), 5,
               cv.GC_INIT_WITH_MASK)
    ref_fg = (ref_mask == 1) | (ref_mask == 3)
    ours_fg = rgba[..., 3] > 0
    assert (ours_fg == ref_fg).mean() > 0.97

    # crop-rect path: rect seeding recovers the blob
    rgba2 = run_grabcut_workflow(bgr, None, rect_xywh=(20, 10, 45, 42),
                                 iterations=5)
    fg2 = rgba2[..., 3] > 0
    inter = (fg2 & blob).sum()
    assert inter / blob[10:52, 20:65].sum() > 0.6

    assert run_grabcut_workflow(bgr, None) is None
