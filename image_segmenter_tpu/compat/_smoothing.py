"""The five boundary smoothers (reference region_cleanup.py:788-1040).

Per-unique-color python loops in the reference become single compiled
programs: a `lax.fori_loop` over the TPU-resident color table, with the
reference's sequential-overwrite semantics reproduced by last-write-wins
priority composition. The bilateral palette snap — an O(H*W*K) pure-Python
loop in the reference (:853-860) — is one blocked nearest-neighbor matmul.
Contour smoothing rasterizes through host geometry (ops/contours.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.ops import contours as CONT
from image_segmenter_tpu.ops import morphology as M
from image_segmenter_tpu.ops import unique as U
from image_segmenter_tpu.solvers import knn as NN

_CAP = 4096  # max distinct colors a smoother loops over (reference: palette-sized)


def _validate_rgba(rgba: np.ndarray) -> None:
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")


@jax.jit
def _color_table(rgba: jnp.ndarray):
    nt = rgba[..., 3] > 0
    packed = C.pack_rgb_u32(rgba[..., :3]).reshape(-1)
    vals, counts, n = U.packed_unique(packed, nt.reshape(-1), cap=_CAP)
    return vals, counts, n


def _conv_same(x, k, pad_value):
    kh, kw = k.shape
    xp = jnp.pad(x, ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
                 constant_values=pad_value)
    return lax.conv_general_dilated(
        xp[None, None], jnp.asarray(k, jnp.float32)[None, None],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


# --------------------------------------------------------------------------
# morphological (:788-827)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ksize",))
def _morphological_core(rgba: jnp.ndarray, vals: jnp.ndarray, n: jnp.ndarray,
                        ksize: int):
    h, w = rgba.shape[:2]
    nt = rgba[..., 3] > 0
    cid = C.pack_rgb_u32(rgba[..., :3])
    se = M.structuring_element(M.ELLIPSE, (ksize, ksize)).astype(np.float32)
    total = float(se.sum())

    # cv2 reads src(p + k - anchor) for BOTH erode and dilate (no flip)
    def open_close(mask):
        m = mask.astype(jnp.float32)
        m = (_conv_same(m, se, 1.0) > total - 0.5).astype(jnp.float32)   # erode
        m = (_conv_same(m, se, 0.0) > 0.5).astype(jnp.float32)           # dilate
        m = (_conv_same(m, se, 0.0) > 0.5).astype(jnp.float32)           # dilate
        m = (_conv_same(m, se, 1.0) > total - 0.5).astype(jnp.float32)   # erode
        return m > 0.5

    def body(k, best):
        mask = nt & (cid == vals[k])
        closed = open_close(mask)
        return jnp.where(closed, k, best)

    best = lax.fori_loop(0, n, body, jnp.full((h, w), -1, jnp.int32))
    covered = best >= 0
    new_rgb = C.unpack_rgb_u32(vals[jnp.clip(best, 0, _CAP - 1)])
    rgb = jnp.where(covered[..., None], new_rgb, rgba[..., :3])
    alpha = jnp.where(covered, 255, rgba[..., 3]).astype(jnp.uint8)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def morphological_smoothing(rgba: np.ndarray, strength: float,
                            preserve_colors: bool) -> np.ndarray:
    _validate_rgba(rgba)
    if not np.any(rgba[..., 3] > 0):
        return rgba.copy()
    ksize = max(1, int(strength * 4) + 1)
    x = jnp.asarray(rgba)
    vals, _, n = _color_table(x)
    return np.asarray(_morphological_core(x, vals, n, ksize))


# --------------------------------------------------------------------------
# gaussian (:914-977)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ksize",))
def _gaussian_core(rgba: jnp.ndarray, vals: jnp.ndarray, n: jnp.ndarray,
                   sigma: jnp.ndarray, ksize: int):
    h, w = rgba.shape[:2]
    nt = rgba[..., 3] > 0
    cid = C.pack_rgb_u32(rgba[..., :3])
    se3 = M.structuring_element(M.ELLIPSE, (3, 3)).astype(np.float32)
    se3f = np.ascontiguousarray(se3[::-1, ::-1])
    total3 = float(se3.sum())

    # Gaussian kernel from traced sigma (cv2 getGaussianKernel semantics;
    # sigma > 0 always here since strength in (0, 1]).
    r = (ksize - 1) // 2
    xs = jnp.arange(ksize, dtype=jnp.float32) - r
    g = jnp.exp(-(xs * xs) / (2.0 * jnp.maximum(sigma, 1e-6) ** 2))
    g = g / jnp.sum(g)

    def blur_u8(img_f):
        # separable blur with reflect-101 border, rounded like cv2 on uint8
        extra = ((0, 0),) if img_f.ndim == 3 else ()
        x = jnp.pad(img_f, ((r, r), (0, 0)) + extra, mode="reflect")
        x = sum(x[i : i + h] * g[i] for i in range(ksize))
        x = jnp.pad(x, ((0, 0), (r, r)) + extra, mode="reflect")
        x = sum(x[:, i : i + w] * g[i] for i in range(ksize))
        return jnp.floor(x + 0.5)

    def body(k, smoothed):
        mask = nt & (cid == vals[k])
        mf = mask.astype(jnp.float32)
        # close 3x3 (:947)
        d = (_conv_same(mf, se3f, 0.0) > 0.5).astype(jnp.float32)
        closed = (_conv_same(d, se3, 1.0) > total3 - 0.5).astype(jnp.float32)
        blurred_mask = blur_u8(closed * 255.0)  # u8-rounded
        m = blurred_mask / 255.0
        strong = m > 0.3
        color = C.unpack_rgb_u32(vals[k]).astype(jnp.float32)
        temp = mf[..., None] * color  # color where mask else 0 (:953-954)
        blurred_temp = blur_u8(temp)  # u8-rounded per channel
        blended = smoothed.astype(jnp.float32) * (1.0 - m[..., None]) + blurred_temp * m[..., None]
        # reference casts with .astype(np.uint8) -> truncation (:966-969)
        blended = jnp.clip(jnp.floor(blended), 0, 255).astype(jnp.uint8)
        return jnp.where(strong[..., None], blended, smoothed)

    smoothed = lax.fori_loop(0, n, body, rgba[..., :3])
    return jnp.concatenate([smoothed, rgba[..., 3:]], axis=-1)


def gaussian_smoothing(rgba: np.ndarray, strength: float,
                       preserve_colors: bool) -> np.ndarray:
    _validate_rgba(rgba)
    if not np.any(rgba[..., 3] > 0):
        return rgba.copy()
    ksize = max(3, int(strength * 6) + 1)
    if ksize % 2 == 0:
        ksize += 1
    sigma = strength * 1.0
    x = jnp.asarray(rgba)
    if preserve_colors:
        vals, _, n = _color_table(x)
        return np.asarray(_gaussian_core(x, vals, n, jnp.float32(sigma), ksize))
    blurred = M.gaussian_blur(x[..., :3], ksize, sigma)
    out = rgba.copy()
    out[..., :3] = np.clip(np.floor(np.asarray(blurred) + 0.5), 0, 255).astype(np.uint8)
    return out


# --------------------------------------------------------------------------
# bilateral (:830-863)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("d",))
def _bilateral_core(rgb: jnp.ndarray, sigma_color: jnp.ndarray,
                    sigma_space: jnp.ndarray, d: int):
    """cv2.bilateralFilter semantics: L1 color distance across channels,
    Gaussian space/color weights, reflect-101 border."""
    h, w = rgb.shape[:2]
    r = d // 2 if d > 0 else 1
    x = rgb.astype(jnp.float32)
    xp = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="reflect")
    gauss_c = -0.5 / (sigma_color * sigma_color)
    gauss_s = -0.5 / (sigma_space * sigma_space)
    num = jnp.zeros_like(x)
    den = jnp.zeros((h, w), jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dx * dx + dy * dy > r * r:
                continue  # cv2 uses a circular neighborhood
            nb = lax.dynamic_slice(xp, (r + dy, r + dx, 0), (h, w, 3))
            cdist = jnp.sum(jnp.abs(nb - x), axis=-1)
            wgt = jnp.exp(gauss_c * cdist * cdist + gauss_s * (dx * dx + dy * dy))
            num = num + nb * wgt[..., None]
            den = den + wgt
    out = num / jnp.maximum(den, 1e-20)[..., None]
    return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)


@jax.jit
def _palette_snap(filtered: jnp.ndarray, rgba: jnp.ndarray, vals: jnp.ndarray,
                  n: jnp.ndarray):
    """Snap non-transparent filtered pixels to the nearest original color.

    Replaces the reference's per-pixel python loop (:853-860). The reference
    computes np.linalg.norm on a uint8 difference (wraparound); default
    behavior here is the signed distance (bug fixed).
    """
    h, w = rgba.shape[:2]
    nt = rgba[..., 3] > 0
    uniq = C.unpack_rgb_u32(vals).astype(jnp.float32)
    valid = jnp.arange(vals.shape[0]) < n
    idx = NN.nearest_index(filtered.reshape(-1, 3).astype(jnp.float32), uniq, valid)
    snapped = C.unpack_rgb_u32(vals[idx]).reshape(h, w, 3)
    return jnp.where(nt[..., None], snapped, filtered)


def bilateral_smoothing(rgba: np.ndarray, strength: float,
                        preserve_colors: bool) -> np.ndarray:
    _validate_rgba(rgba)
    if not np.any(rgba[..., 3] > 0):
        return rgba.copy()
    d = max(1, int(strength * 9) + 1)
    sigma_color = max(1, int(strength * 75) + 1)
    sigma_space = max(1, int(strength * 75) + 1)
    x = jnp.asarray(rgba)
    filtered = _bilateral_core(x[..., :3], jnp.float32(sigma_color),
                               jnp.float32(sigma_space), d)
    if preserve_colors:
        vals, _, n = _color_table(x)
        filtered = _palette_snap(filtered, x, vals, n)
    out = rgba.copy()
    out[..., :3] = np.asarray(filtered)
    return out


# --------------------------------------------------------------------------
# contour (:866-911)
# --------------------------------------------------------------------------

def contour_smoothing(rgba: np.ndarray, strength: float,
                      preserve_colors: bool) -> np.ndarray:
    _validate_rgba(rgba)
    if not np.any(rgba[..., 3] > 0):
        return rgba.copy()
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3]
    nt = rgba[..., 3] > 0
    uniq = np.unique(rgb[nt].reshape(-1, 3), axis=0)
    smoothed = np.zeros_like(rgba)
    for color in uniq:
        mask = np.all(rgb == color, axis=2) & nt
        conts = CONT.external_contours(mask)
        if not conts:
            continue
        # reference scales epsilon by the FIRST contour's arc length (:897)
        eps = strength * 0.02 * CONT.arc_length(conts[0], closed=True)
        fill = np.zeros((h, w), np.uint8)  # u8 buffer -> native fast path
        for cont in conts:
            approx = CONT.approx_poly_dp(cont, eps, closed=True)
            CONT.fill_polygon(fill, approx)
        smoothed[fill > 0, :3] = color
        smoothed[fill > 0, 3] = 255
    return smoothed


# --------------------------------------------------------------------------
# multiscale (:980-1040)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ksizes",))
def _multiscale_core(rgba: jnp.ndarray, entry_vals: jnp.ndarray,
                     entry_kidx: jnp.ndarray, entry_n: jnp.ndarray,
                     ksizes: tuple):
    """Compose (color, kernel) footprints in priority order: entries are
    pre-sorted ascending by the reference's write order, so the loop's
    last-write-wins is literal."""
    h, w = rgba.shape[:2]
    nt = rgba[..., 3] > 0
    cid = C.pack_rgb_u32(rgba[..., :3])

    ses = []
    for ks in ksizes:
        se = M.structuring_element(M.ELLIPSE, (ks, ks)).astype(np.float32)
        ses.append((se, float(se.sum())))

    # cv2 reads src(p + k - anchor) for BOTH erode and dilate (no flip)
    def open_close(mask, kidx):
        def apply(i):
            se, tot = ses[i]
            m = mask.astype(jnp.float32)
            m = (_conv_same(m, se, 1.0) > tot - 0.5).astype(jnp.float32)
            m = (_conv_same(m, se, 0.0) > 0.5).astype(jnp.float32)
            m = (_conv_same(m, se, 0.0) > 0.5).astype(jnp.float32)
            m = (_conv_same(m, se, 1.0) > tot - 0.5).astype(jnp.float32)
            return m > 0.5
        return lax.switch(kidx, [functools.partial(apply, i) for i in range(len(ses))])

    def body(e, best):
        mask = nt & (cid == entry_vals[e])
        kidx = entry_kidx[e]
        sm = lax.cond(kidx >= 0, lambda: open_close(mask, jnp.maximum(kidx, 0)),
                      lambda: mask)
        return jnp.where(sm, e, best)

    best = lax.fori_loop(0, entry_n, body, jnp.full((h, w), -1, jnp.int32))
    covered = best >= 0
    new_rgb = C.unpack_rgb_u32(entry_vals[jnp.clip(best, 0, entry_vals.shape[0] - 1)])
    rgb = jnp.where(covered[..., None], new_rgb, jnp.zeros_like(rgba[..., :3]))
    alpha = jnp.where(covered, 255, 0).astype(jnp.uint8)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def multiscale_smoothing(rgba: np.ndarray, strength: float,
                         preserve_colors: bool) -> np.ndarray:
    _validate_rgba(rgba)
    if not np.any(rgba[..., 3] > 0):
        return rgba.copy()
    from image_segmenter_tpu.compat.region_cleanup import analyze_regions

    stats = analyze_regions(rgba, min_size_threshold=10)
    all_regions = stats.get("all_regions", [])
    if not all_regions:
        return rgba.copy()

    sizes = [r["size"] for r in all_regions]
    max_size, min_size = max(sizes), min(sizes)
    large_thr = min_size + (max_size - min_size) * 0.7
    medium_thr = min_size + (max_size - min_size) * 0.3

    # Region write order == analyze order; kernel size per region from its
    # size tier (:1010-1035). Same (color, kernel) writes share a footprint;
    # the LAST write with a given footprint sets its priority.
    entries = {}  # (packed_color, ksize or -1) -> priority (write order)
    for order, region in enumerate(all_regions):
        rs = region["size"]
        tier = (0.3 if rs >= large_thr else 0.6 if rs >= medium_thr else 1.0)
        region_strength = strength * tier
        ks = max(1, int(region_strength * 5) + 1) if region_strength > 0.1 else -1
        c = region["color"]
        packed = (c[0] << 16) | (c[1] << 8) | c[2]
        entries[(packed, ks)] = order

    ordered = sorted(entries.items(), key=lambda kv: kv[1])
    ksizes = sorted({ks for (_, ks), _ in ordered if ks > 0})
    if not ksizes:
        ksizes = [1]
    kidx_map = {ks: i for i, ks in enumerate(ksizes)}
    n_e = len(ordered)
    cap = max(16, 1 << (n_e - 1).bit_length())
    entry_vals = np.zeros(cap, np.uint32)
    entry_kidx = np.full(cap, -1, np.int32)
    for i, ((packed, ks), _) in enumerate(ordered):
        entry_vals[i] = packed
        entry_kidx[i] = kidx_map.get(ks, -1)

    return np.asarray(_multiscale_core(
        jnp.asarray(rgba), jnp.asarray(entry_vals), jnp.asarray(entry_kidx),
        jnp.int32(n_e), tuple(ksizes)))
