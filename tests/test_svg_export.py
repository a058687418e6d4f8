"""SVG export: valid XML, layer per color, holes via even-odd fill."""

import xml.etree.ElementTree as ET

import numpy as np

from image_segmenter_tpu.utils.svg_export import export_svg


def test_export_basic(tmp_path):
    rgba = np.zeros((40, 60, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[:, :30, :3] = [200, 40, 40]
    rgba[:, 30:, :3] = [40, 180, 60]
    # a blue ring (tests hole handling)
    yy, xx = np.mgrid[0:40, 0:60]
    ring = (((yy - 20) ** 2 + (xx - 15) ** 2) < 100) & (((yy - 20) ** 2 + (xx - 15) ** 2) > 25)
    rgba[ring, :3] = [10, 10, 200]

    out_file = tmp_path / "layers.svg"
    svg = export_svg(rgba, str(out_file), simplify_eps=0.0)
    assert out_file.read_text() == svg

    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    assert root.get("width") == "60" and root.get("height") == "40"
    paths = [c for c in root if c.tag.endswith("path")]
    fills = {p.get("fill") for p in paths}
    assert fills == {"#c82828", "#28b43c", "#0a0ac8"}
    # the ring layer must contain at least two subpaths (outline + hole)
    ring_path = next(p for p in paths if p.get("fill") == "#0a0ac8")
    assert ring_path.get("d").count("M ") >= 2
    assert ring_path.get("fill-rule") == "evenodd"


def test_export_transparent_and_simplify():
    rgba = np.zeros((8, 8, 4), np.uint8)
    svg = export_svg(rgba)
    root = ET.fromstring(svg)
    assert len([c for c in root if c.tag.endswith("path")]) == 0

    rgba[..., 3] = 255
    rgba[..., :3] = [1, 2, 3]
    svg = export_svg(rgba, simplify_eps=1.0)
    assert "#010203" in svg
