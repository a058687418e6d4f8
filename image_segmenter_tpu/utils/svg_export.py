"""SVG layer export for quantized images.

The reference app is titled "Image Segmenter & SVG Layout" and declares
svgwrite+shapely (requirements.txt:7-8), but the export was never built
(SURVEY.md §2 #18). This completes the intended feature: each palette color
of a quantized RGBA image becomes an SVG layer of vector paths — contours
traced by the native geometry engine (holes included via even-odd fill),
optionally Douglas-Peucker simplified. Pure stdlib output (SVG is just XML).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from image_segmenter_tpu.ops import contours as CONT


def _color_hex(color) -> str:
    return "#{:02x}{:02x}{:02x}".format(int(color[0]), int(color[1]), int(color[2]))


def _region_paths(mask: np.ndarray, simplify_eps: float) -> List[np.ndarray]:
    """Outer contours + hole contours of a binary mask (even-odd rendering).

    Holes are the outer contours of the inverted mask restricted to enclosed
    background; with fill-rule="evenodd" drawing both produces correct holes.
    """
    paths = [c for c in CONT.external_contours(mask) if len(c) >= 1]
    # enclosed background = background components not touching the border
    inv = ~mask.astype(bool)
    if inv.any():
        from scipy import ndimage  # labeled holes (host-side, tiny)

        lbl, n = ndimage.label(inv)
        border = set(np.unique(np.concatenate([
            lbl[0, :], lbl[-1, :], lbl[:, 0], lbl[:, -1]])))
        for i in range(1, n + 1):
            if i in border:
                continue
            hole = lbl == i
            paths.extend(c for c in CONT.external_contours(hole) if len(c) >= 1)
    if simplify_eps > 0:
        paths = [CONT.approx_poly_dp(p, simplify_eps, closed=True) for p in paths]
    return [p for p in paths if len(p) >= 3]


def export_svg(
    rgba: np.ndarray,
    path: Optional[str] = None,
    simplify_eps: float = 0.0,
    min_region_px: int = 1,
) -> str:
    """Render a quantized RGBA image as layered SVG vector paths.

    Layers are emitted largest-coverage-first (background colors first) so
    smaller regions draw on top. Returns the SVG text; writes it to `path`
    if given.
    """
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")
    h, w = rgba.shape[:2]
    nt = rgba[..., 3] > 0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}">'
    ]
    if nt.any():
        colors, counts = np.unique(rgba[nt][:, :3].reshape(-1, 3), axis=0,
                                   return_counts=True)
        order = np.argsort(-counts)
        for ci in order:
            color = colors[ci]
            if counts[ci] < min_region_px:
                continue
            mask = np.all(rgba[..., :3] == color, axis=2) & nt
            paths = _region_paths(mask, simplify_eps)
            if not paths:
                continue
            d_parts = []
            for p in paths:
                coords = " L ".join(f"{x},{y}" for x, y in p)
                d_parts.append(f"M {coords} Z")
            parts.append(
                f'<path fill="{_color_hex(color)}" fill-rule="evenodd" '
                f'd="{" ".join(d_parts)}"/>'
            )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg
