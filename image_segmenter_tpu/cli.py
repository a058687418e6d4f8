"""Command-line driver for the reference app's full workflow.

The reference ships its workflow as a PySide6 GUI (app/main.py ->
MainWindow); this CLI is the library-native equivalent: the same stage
sequence the window's buttons fire — AI background removal
(main_window.py:388), optional portrait matting refine (:441), color
simplification (:585), region cleanup (:1050), boundary smoothing (:1146),
tendril trimming (harness behavior) — with every default matching the
panels' widget defaults (config.Defaults carries the citations).

    python -m image_segmenter_tpu.cli photo.png cutout.png \
        --colors 8 --algorithm adaptive --cleanup --smooth morphological

Stages run only when requested (like the app: each is one button); the
workflow state promotions mirror MainWindow's three slots.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from image_segmenter_tpu.config import DEFAULTS


def _load_rgba(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    return np.asarray(img, np.uint8).copy()


def _save(path: str, rgba: np.ndarray) -> None:
    from PIL import Image

    # Mirror the reference's save path (main_window.py:1202-1267): RGBA for
    # formats with alpha, flattened for JPEG.
    img = Image.fromarray(rgba, "RGBA")
    if path.lower().endswith((".jpg", ".jpeg")):
        img = img.convert("RGB")
    img.save(path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="image-segmenter-tpu",
        description=__doc__.split("\n\n")[0],
    )
    p.add_argument("input", help="input image (anything PIL reads)")
    p.add_argument("output", help="output image path (.png/.tiff/.bmp/.jpg)")

    bg = p.add_argument_group("background removal (BG tools panel)")
    bg.add_argument("--rembg", action="store_true",
                    help="run AI background removal (panel: 'AI Remove BG')")
    from image_segmenter_tpu.config import REMBG_MODELS

    bg.add_argument("--model", default=DEFAULTS.rembg_model,
                    choices=list(REMBG_MODELS),
                    help=f"rembg model id (default {DEFAULTS.rembg_model})")
    bg.add_argument("--soft-edges", action="store_true",
                    help="skip the Otsu sharpening post-pass")
    bg.add_argument("--refine-portrait", action="store_true",
                    help="closed-form matting refine of the alpha (panel: "
                         "'Refine Portrait')")
    bg.add_argument("--grabcut-rect", metavar="X,Y,W,H",
                    help="GrabCut with a rectangle seed instead of rembg")

    cp = p.add_argument_group("color processing panel")
    cp.add_argument("--colors", type=int, default=DEFAULTS.num_colors,
                    help=f"number of colors (default {DEFAULTS.num_colors})")
    cp.add_argument("--algorithm", default="adaptive",
                    choices=["adaptive", "kmeans", "median_cut", "octree",
                             "threshold", "perceptual", "perceptual_fast",
                             "adaptive_distance", "hsv_clustering"],
                    help="quantization algorithm (default adaptive)")
    cp.add_argument("--palette", metavar="RRGGBB,RRGGBB,...",
                    help="custom palette hex colors (overrides --algorithm)")
    cp.add_argument("--distance-metric", default="lab",
                    choices=["lab", "rgb", "hsv"],
                    help="custom-palette distance space (default lab)")
    cp.add_argument("--no-simplify", action="store_true",
                    help="skip color simplification entirely")

    rc = p.add_argument_group("region cleanup panel")
    rc.add_argument("--cleanup", action="store_true",
                    help="merge small regions (panel: 'Clean Up Regions')")
    rc.add_argument("--min-region-size", type=int,
                    default=DEFAULTS.min_region_size)
    rc.add_argument("--auto-merge-threshold", type=float,
                    default=DEFAULTS.auto_merge_threshold)
    rc.add_argument("--connectivity", type=int, default=DEFAULTS.connectivity,
                    choices=[4, 8])
    rc.add_argument("--smooth", metavar="METHOD",
                    choices=["morphological", "bilateral", "contour",
                             "gaussian", "multiscale", "majority"],
                    help="boundary smoothing method (panel combo; 'majority' "
                         "is the harness's iterative smoother)")
    rc.add_argument("--smooth-strength", type=float,
                    default=DEFAULTS.smoothing_strength)
    rc.add_argument("--trim-tendrils", type=int, metavar="THRESHOLD",
                    help="tendril trimming at the given thickness threshold")

    p.add_argument("--stats", action="store_true",
                   help="print color/region statistics dicts (panel readouts)")
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = (lambda *a: None) if args.quiet else (
        lambda *a: print(*a, file=sys.stderr))

    from image_segmenter_tpu.utils.progress import ConsoleProgress
    from image_segmenter_tpu.utils.workflow import WorkflowState

    rgba = _load_rgba(args.input)
    state = WorkflowState(rgba)
    log(f"loaded {args.input}: {rgba.shape[1]}x{rgba.shape[0]}")

    # ---- background removal (main_window.py:388 / :243) --------------------
    if args.grabcut_rect:
        from processing.grabcut import apply_grabcut

        x, y, w, h = (int(v) for v in args.grabcut_rect.split(","))
        bgr = rgba[..., :3][..., ::-1].copy()
        mask = apply_grabcut(bgr, rect_xywh=(x, y, w, h),
                             iterations=DEFAULTS.grabcut_iterations)
        fg = (mask == 1) | (mask == 3)
        out = rgba.copy()
        out[..., 3] = np.where(fg, 255, 0).astype(np.uint8)
        state.set_ai_output(out)
        log(f"grabcut: foreground {fg.mean():.1%}")
    elif args.rembg:
        from processing.rembg_infer import rembg_remove_bgr_to_rgba

        bgr = rgba[..., :3][..., ::-1].copy()
        out = rembg_remove_bgr_to_rgba(
            bgr, model=args.model, sharp_edges=not args.soft_edges)
        state.set_ai_output(out)
        log(f"rembg[{args.model}]: opaque {(out[..., 3] > 0).mean():.1%}")

    if args.refine_portrait:
        from processing.matting_refine import refine_alpha_portrait

        src = state.working_image
        alpha0 = src[..., 3]
        refined = refine_alpha_portrait(
            np.ascontiguousarray(src[..., :3]), alpha0, None)
        out = np.dstack([src[..., :3], refined])
        state.set_ai_output(out)
        log("portrait matting refine applied")

    # ---- color simplification (main_window.py:585 / :634) ------------------
    if args.palette:
        from processing.color_simplify import (
            create_palette_from_colors, simplify_colors_custom_palette)

        cols = [tuple(int(c[i:i + 2], 16) for i in (0, 2, 4))
                for c in args.palette.split(",")]
        pal = create_palette_from_colors(cols)
        src = state.working_image
        out, pal = simplify_colors_custom_palette(
            src, pal, True, distance_metric=args.distance_metric)
        state.set_simplified_preview(out)
        state.apply_color_processing()
        log(f"custom palette: {len(pal)} colors")
    elif not args.no_simplify:
        from processing.color_simplify import simplify_colors_adaptive

        src = state.working_image
        out, pal = simplify_colors_adaptive(
            src, args.colors, True, algorithm=args.algorithm)
        state.set_simplified_preview(out)
        state.apply_color_processing()
        log(f"simplify[{args.algorithm}]: {len(pal)} colors")

    # ---- region cleanup (main_window.py:1050) ------------------------------
    if args.cleanup:
        from processing.region_cleanup import merge_small_regions

        src = state.working_image
        prog = None if args.quiet else ConsoleProgress("cleanup")
        out = merge_small_regions(
            src, args.min_region_size, None, args.auto_merge_threshold,
            None, prog, args.connectivity)
        state.set_cleaned_preview(out)
        state.apply_cleanup()

    # ---- smoothing (main_window.py:1146 / harness) -------------------------
    if args.smooth == "majority":
        from image_segmenter_tpu.compat.harness import (
            apply_boundary_smoothing_global)

        out = apply_boundary_smoothing_global(state.working_image)
        state.set_cleaned_preview(out)
        state.apply_cleanup()
        log("majority smoothing applied")
    elif args.smooth:
        from processing.region_cleanup import smooth_region_boundaries

        out = smooth_region_boundaries(
            state.working_image, args.smooth, args.smooth_strength)
        state.set_cleaned_preview(out)
        state.apply_cleanup()
        log(f"smoothing[{args.smooth}] applied")

    # ---- tendril trimming --------------------------------------------------
    if args.trim_tendrils is not None:
        from processing.tendril_trimming import trim_tendrils

        out, iters, msg = trim_tendrils(state.working_image,
                                        args.trim_tendrils)
        state.set_cleaned_preview(out)
        state.apply_cleanup()
        log(f"tendrils: {msg}")

    # ---- stats (panel readouts) --------------------------------------------
    if args.stats:
        import json

        from processing.color_simplify import get_color_statistics
        from processing.region_cleanup import analyze_regions

        src = state.working_image
        cs = get_color_statistics(src)
        rs = analyze_regions(src, args.min_region_size, args.connectivity)
        slim = {k: v for k, v in rs.items() if k != "all_regions"}
        slim["region_colors"] = len(slim.get("region_colors", []))
        slim["region_sizes"] = len(slim.get("region_sizes", []))
        print(json.dumps({"color": {k: (v if not hasattr(v, "tolist") else v.tolist())
                                    for k, v in cs.items()},
                          "regions": slim}, default=str, indent=1))

    _save(args.output, state.working_image)
    log(f"saved {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
