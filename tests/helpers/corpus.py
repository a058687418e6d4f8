"""Real-photo corpus for IoU acceptance runs (BASELINE.json: mask IoU >= 0.99
vs the CPU reference on real photographs, VERDICT round-1 item 5).

The container has no network, no rembg checkpoints, and no photo datasets
beyond what ships inside installed packages, so the corpus draws from every
real photographic bitmap available on this system:

- sklearn's two bundled sample photographs (china.jpg, flower.jpg — real
  daylight photos, 427x640);
- the reference's own working image (/root/reference/app/working_image_cleaned
  .bmp, 1024x1024 — the asset BASELINE.json config 1 keys on);
- labmaze's photographic skybox/surface textures (real photographed sky and
  floor material scans, 512-1024 square).

Images are center-cropped square and resized to a common working size so the
scipy matting oracle (explicit sparse Laplacian solve) stays tractable.
"""

from __future__ import annotations

import glob
import os

import numpy as np

_LABMAZE_ASSETS = "/opt/venv/lib/python3.12/site-packages/labmaze/assets"
_REFERENCE_BMP = "/root/reference/app/working_image_cleaned.bmp"


def _center_square(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    y0 = (h - s) // 2
    x0 = (w - s) // 2
    return img[y0 : y0 + s, x0 : x0 + s]


def load_corpus(size: int = 256, limit: int | None = None):
    """Yield (name, rgb_u8 HxWx3) for every real photo available, resized to
    (size, size) with PIL bilinear (deterministic across platforms)."""
    from PIL import Image

    entries = []

    try:
        from sklearn.datasets import load_sample_image

        for n in ("china.jpg", "flower.jpg"):
            entries.append((n.split(".")[0], load_sample_image(n)))
    except Exception:
        pass

    if os.path.exists(_REFERENCE_BMP):
        entries.append(
            ("working_image", np.asarray(Image.open(_REFERENCE_BMP).convert("RGB")))
        )

    # photographic texture/skybox scans: one face per material family
    for pat in ("sky_*/up.png", "sky_*/ft.png", "style_0*/floor_*_d.png"):
        for p in sorted(glob.glob(os.path.join(_LABMAZE_ASSETS, pat))):
            name = "-".join(p.split(os.sep)[-2:]).rsplit(".", 1)[0]
            entries.append((name, np.asarray(Image.open(p).convert("RGB"))))
            if pat.startswith("style") and sum(
                1 for e in entries if e[0].startswith("style")
            ) >= 6:
                break

    out = []
    for name, rgb in entries:
        sq = Image.fromarray(_center_square(np.ascontiguousarray(rgb)))
        out.append((name, np.asarray(sq.resize((size, size), Image.BILINEAR))))
        if limit is not None and len(out) >= limit:
            break
    return out


def synthetic_alpha_init(rgb: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic photo-dependent alpha initialization standing in for the
    CNN stage (no trained checkpoint exists in this container; CNN parity is
    proven separately against the torch oracle in tests/test_models.py).

    Shaped like a real segmentation-net output: saturated FG/BG (a smoothed
    Otsu region intersected with a centered ellipse) with a soft few-pixel
    transition band. The resulting trimap is mostly-known with a thin unknown
    band — the regime the app always operates in (CNN alphas have range > 50
    so the 220/20 threshold arm applies, matting_refine.py:95-101). Low-
    contrast inits with huge unknown regions make the closed-form system
    arbitrarily ill-conditioned (the alpha is simply not determined far from
    any constraint) and are not representative of any reference code path.
    """
    import cv2 as cv

    gray = cv.cvtColor(rgb, cv.COLOR_RGB2GRAY)
    _, otsu = cv.threshold(gray, 0, 255, cv.THRESH_BINARY + cv.THRESH_OTSU)
    h, w = gray.shape
    # keep the object-ish central Otsu side, drop border-touching clutter
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ellipse = (((yy - h / 2) / (0.42 * h)) ** 2
               + ((xx - w / 2) / (0.42 * w)) ** 2) < 1.0
    core = ((otsu > 0) & ellipse).astype(np.uint8)
    core = cv.morphologyEx(core, cv.MORPH_CLOSE, np.ones((7, 7), np.uint8))
    if core.sum() < 0.05 * h * w:  # Otsu side was the background — flip
        core = ((otsu == 0) & ellipse).astype(np.uint8)
        core = cv.morphologyEx(core, cv.MORPH_CLOSE, np.ones((7, 7), np.uint8))
    soft = cv.GaussianBlur(core * 255.0, (0, 0), 1.5)
    return np.clip(soft, 0, 255).astype(np.uint8)
