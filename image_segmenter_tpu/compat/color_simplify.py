"""Color quantizer suite — reference-compatible API over TPU solvers.

Re-implements /root/reference/app/processing/color_simplify.py (1219 LoC)
with the same public signatures and semantics. The sklearn/skimage/PIL/OpenCV
native paths become jitted XLA programs:

- kmeans            -> solvers.kmeans (weighted Lloyd + kmeans++, MXU matmuls)
- median_cut/octree -> solvers.median_cut (the reference's "octree" IS
                       median-cut, color_simplify.py:201)
- threshold         -> fused elementwise posterize
- perceptual        -> solvers.agglomerative (exact Ward via NN-chain) in LAB
- perceptual_fast   -> k-means in LAB on downsampled unique colors
- adaptive_distance -> solvers.dbscan (grid-hashed radius search) + k-means
- hsv_clustering    -> k-means on weighted OpenCV-convention HSV
- custom_palette    -> nearest-neighbor map in lab/rgb/hsv space

Reference bugs are FIXED by default and reproducible with bug_compat=True
(config.Defaults.bug_compat): the kmeans chained-fancy-index no-op that
leaves the output RGB black (color_simplify.py:90), and perceptual's mapping
of LAB pixels against *RGB* cluster centers (color_simplify.py:544).

Determinism note: the reference samples pixels with an unseeded
np.random.choice (color_simplify.py:444,634); this implementation seeds its
subsampling with Defaults.kmeans_seed so results are reproducible.
"""

from __future__ import annotations

import functools
import time
import warnings  # noqa: F401  (parity with reference import surface)
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from image_segmenter_tpu.config import DEFAULTS
from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.ops import resize as RZ
from image_segmenter_tpu.ops import unique as U
from image_segmenter_tpu.solvers import kmeans as KM

_UNIQUE_CAP = 1 << 16

# Stage attribution of the most recent hsv_clustering call (read by
# bench/baseline_configs.py config 3; same convention as
# solvers/matting.LAST_SOLVE_INFO and solvers/grabcut.LAST_SOLVE_INFO).
LAST_SOLVE_INFO: dict = {}


def _validate_rgba(rgba: np.ndarray) -> None:
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")


def _fallback(rgba: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's no-op return: (original, [[0,0,0]])."""
    return rgba, np.array([[0, 0, 0]])


# --------------------------------------------------------------------------
# jitted cores (cached per input shape / static args)
# --------------------------------------------------------------------------

@jax.jit
def _kmeans_masks(rgba: jnp.ndarray):
    """Masks + scalar stats for the kmeans black-filter ladder.

    Returns per-pixel masks (H*W,) and the scalar counts the host needs for
    the reference's data-dependent choices (color_simplify.py:44-74).
    """
    rgb = rgba[..., :3].reshape(-1, 3)
    alpha = rgba[..., 3].reshape(-1)
    nt = alpha > 0
    brightness = jnp.mean(rgb.astype(jnp.float32), axis=1)
    b30 = nt & (brightness > 30)
    b10 = nt & (brightness > 10)
    packed = C.pack_rgb_u32(rgb)
    return (
        nt, b30, b10,
        jnp.sum(nt), jnp.sum(b30), jnp.sum(b10),
        U.count_unique(packed, b30),
        U.count_unique(packed, b10),
        U.count_unique(packed, nt),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeans_fit_rgb(rgba: jnp.ndarray, weights: jnp.ndarray, k: int):
    """Weighted k-means over DEDUPLICATED colors — mathematically identical
    to pixel-level k-means (weighted Lloyd == Lloyd on repeats; kmeans++
    count*D^2 sampling == pixel-level D^2 sampling) at ~1/100 the FLOPs on
    photographic images. Falls back to the pixel path past the table cap.
    """
    rgb = rgba[..., :3].reshape(-1, 3)
    packed = C.pack_rgb_u32(rgb)
    vals, counts, n_unique = U.packed_unique(packed, weights > 0, cap=_UNIQUE_CAP)
    uniq = C.unpack_rgb_u32(vals).astype(jnp.float32)

    def fit_unique(_):
        res = KM.kmeans_fit(uniq, counts, k, n_init=DEFAULTS.kmeans_n_init,
                            seed=DEFAULTS.kmeans_seed)
        return res.centers

    def fit_pixels(_):
        res = KM.kmeans_fit(rgb.astype(jnp.float32), weights, k,
                            n_init=DEFAULTS.kmeans_n_init,
                            seed=DEFAULTS.kmeans_seed)
        return res.centers

    centers = lax.cond(n_unique <= _UNIQUE_CAP, fit_unique, fit_pixels, None)
    return jnp.clip(centers, 0, 255).astype(jnp.uint8)


@jax.jit
def _map_nearest_rgb(rgba: jnp.ndarray, centers_u8: jnp.ndarray,
                     fit_mask: jnp.ndarray, nt_mask: jnp.ndarray):
    """quantized_rgb: fit-mask pixels -> nearest center; others stay black.

    Mirrors the *intent* of color_simplify.py:87-90 (fixed version of the
    no-op write-back bug).
    """
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3].reshape(-1, 3).astype(jnp.float32)
    labels = KM.assign_labels(rgb, centers_u8.astype(jnp.float32))
    mapped = centers_u8[labels]
    out = jnp.where(fit_mask[:, None], mapped, jnp.zeros_like(mapped))
    return out.reshape(h, w, 3)


@jax.jit
def _alpha_out(alpha: jnp.ndarray, preserve: jnp.ndarray) -> jnp.ndarray:
    """preserve ? alpha : (alpha > 128) * 255   (color_simplify.py:93-97)."""
    binar = (alpha > 128).astype(jnp.uint8) * 255
    return jnp.where(preserve, alpha, binar)


@jax.jit
def _stats_core(rgba: jnp.ndarray):
    flat = rgba.reshape(-1, 4)
    packed = U.pack_rgba_u32(flat)
    n_unique = U.count_unique(packed, jnp.ones(packed.shape, jnp.bool_))
    nt = flat[:, 3] > 0
    n_nt = jnp.sum(nt)
    rgbf = flat[:, :3].astype(jnp.float32)
    w = nt.astype(jnp.float32)[:, None]
    mean = jnp.sum(rgbf * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    var = jnp.sum(((rgbf - mean) ** 2) * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return n_unique, n_nt, mean, jnp.sqrt(var)


@functools.partial(jax.jit, static_argnames=("levels",))
def _posterize(rgba: jnp.ndarray, levels: int):
    """(rgb // step) * step with step = 256 // levels (color_simplify.py:255-261)."""
    step = 256 // levels
    rgb = rgba[..., :3]
    q = (rgb // step) * step
    packed = C.pack_rgb_u32(q)
    vals, _, n = U.packed_unique(packed.reshape(-1),
                                 jnp.ones((q.shape[0] * q.shape[1],), jnp.bool_),
                                 cap=4096)
    return q, vals, n


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def _kmeans_fit_points(points: jnp.ndarray, weights: jnp.ndarray, k: int,
                       max_iter: int = 300):
    res = KM.kmeans_fit(points.astype(jnp.float32), weights, k,
                        n_init=DEFAULTS.kmeans_n_init, max_iter=max_iter,
                        seed=DEFAULTS.kmeans_seed)
    return res.centers


@functools.partial(jax.jit, static_argnames=("k",))
def _cluster_mean_rgb(points: jnp.ndarray, rgb: jnp.ndarray,
                      weights: jnp.ndarray, centers: jnp.ndarray, k: int):
    """Per-cluster weighted mean of rgb for points assigned to each center."""
    labels = KM.assign_labels(points.astype(jnp.float32), centers)
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32) * weights[:, None]
    sums = onehot.T @ rgb.astype(jnp.float32)
    cnts = jnp.sum(onehot, axis=0)[:, None]
    return sums / jnp.maximum(cnts, 1.0), labels


@jax.jit
def _rgba_lab(rgb_u8_flat: jnp.ndarray) -> jnp.ndarray:
    return C.rgb_u8_to_lab(rgb_u8_flat)


# --------------------------------------------------------------------------
# Public API (reference signatures)
# --------------------------------------------------------------------------

def simplify_colors_kmeans(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """K-means color simplification (reference color_simplify.py:12-102)."""
    _validate_rgba(rgba)
    x = jnp.asarray(rgba)
    nt, b30, b10, n_nt, n_b30, n_b10, u30, u10, u_all = _kmeans_masks(x)
    if int(n_nt) == 0:
        return _fallback(rgba)

    # Black-filter ladder (color_simplify.py:54-64)
    if int(n_b30) >= num_colors:
        fit_mask, n_unique = b30, int(u30)
    elif int(n_b10) > 0:
        fit_mask, n_unique = b10, int(u10)
    else:
        fit_mask, n_unique = nt, int(u_all)

    actual_k = min(num_colors, n_unique)
    if actual_k < 2:
        return _fallback(rgba)

    centers = _kmeans_fit_rgb(x, fit_mask.astype(jnp.float32), actual_k)

    if DEFAULTS.bug_compat:
        # Reproduce the chained fancy-index no-op: RGB output stays black
        # (color_simplify.py:90), palette is still correct.
        quantized_rgb = np.zeros_like(rgba[..., :3])
    else:
        quantized_rgb = np.asarray(_map_nearest_rgb(x, centers, fit_mask, nt))

    alpha = np.asarray(_alpha_out(x[..., 3], jnp.bool_(preserve_alpha)))
    simplified = np.dstack([quantized_rgb, alpha])
    return simplified, np.asarray(centers)


def simplify_colors_threshold(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Posterization (reference color_simplify.py:223-277)."""
    _validate_rgba(rgba)
    levels = int(np.ceil(np.cbrt(num_colors)))
    x = jnp.asarray(rgba)
    q, vals, n = _posterize(x, levels)
    alpha = np.asarray(_alpha_out(x[..., 3], jnp.bool_(preserve_alpha)))
    simplified = np.dstack([np.asarray(q), alpha])
    n = int(n)
    palette = np.asarray(C.unpack_rgb_u32(vals[: min(n, num_colors)]))
    return simplified, palette


def simplify_colors_hsv_clustering(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
    hue_tolerance: float = 15.0,
    saturation_tolerance: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """HSV-weighted k-means (reference color_simplify.py:885-1036)."""
    _validate_rgba(rgba)
    LAST_SOLVE_INFO.clear()
    t0 = time.perf_counter()
    x = jnp.asarray(rgba)
    out = _hsv_masks(x)
    nt, f30, f10, n_nt, n_f30, n_f10, u30, u10, u_all = out
    if int(n_nt) == 0:
        return _fallback(rgba)
    if int(n_f30) >= num_colors:
        fit_mask, n_unique, n_fit = f30, int(u30), int(n_f30)
    elif int(n_f10) > 0:
        fit_mask, n_unique, n_fit = f10, int(u10), int(n_f10)
    else:
        fit_mask, n_unique, n_fit = nt, int(u_all), int(n_nt)
    # the int() casts above host-sync the masks program, so this stamp is a
    # true fence (H2D ingest + masks + unique counts)
    LAST_SOLVE_INFO["t_ingest_masks"] = time.perf_counter() - t0

    actual_k = min(num_colors, n_unique)
    if actual_k < 2:
        return _fallback(rgba)

    t0 = time.perf_counter()
    centers_hsv = _hsv_fit(x, fit_mask, actual_k)
    np.asarray(centers_hsv)  # host fence (CLAUDE.md: block alone lies)
    LAST_SOLVE_INFO["t_fit"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    centers_u8, labels_img = _hsv_map(x, fit_mask, centers_hsv, actual_k)
    quantized_rgb = np.asarray(labels_img)
    LAST_SOLVE_INFO["t_map_d2h"] = time.perf_counter() - t0
    LAST_SOLVE_INFO["n_fit_points"] = n_fit
    alpha = np.asarray(_alpha_out(x[..., 3], jnp.bool_(preserve_alpha)))
    return np.dstack([quantized_rgb, alpha]), np.asarray(centers_u8)


@jax.jit
def _hsv_masks(rgba: jnp.ndarray):
    rgb = rgba[..., :3].reshape(-1, 3)
    alpha = rgba[..., 3].reshape(-1)
    nt = alpha > 0
    hsv = C.rgb_u8_to_hsv_cv(rgb)
    v = hsv[..., 2]
    f30 = nt & (v > 30)
    f10 = nt & (v > 10)
    # The reference counts unique *weighted-HSV* vectors (:984); unique RGB
    # is an equivalent proxy for the k >= 2 guard (HSV is a function of RGB).
    packed = C.pack_rgb_u32(rgb)
    return (nt, f30, f10, jnp.sum(nt), jnp.sum(f30), jnp.sum(f10),
            U.count_unique(packed, f30), U.count_unique(packed, f10),
            U.count_unique(packed, nt))


@functools.partial(jax.jit, static_argnames=("k",))
def _hsv_fit(rgba: jnp.ndarray, fit_mask: jnp.ndarray, k: int):
    """Weighted-HSV k-means fit alone (the config-3 attribution split: the
    n_init-restart fit over every pixel dominates; see _hsv_map)."""
    rgb = rgba[..., :3].reshape(-1, 3)
    hsv = C.rgb_u8_to_hsv_cv(rgb)
    # Normalization + importance weights (color_simplify.py:969-981)
    hsv_n = jnp.stack(
        [hsv[..., 0] / 179.0 * 2.0, hsv[..., 1] / 255.0 * 1.5, hsv[..., 2] / 255.0],
        axis=-1,
    )
    wts = fit_mask.astype(jnp.float32)
    return _kmeans_fit_points(hsv_n, wts, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _hsv_map(rgba: jnp.ndarray, fit_mask: jnp.ndarray,
             centers_hsv: jnp.ndarray, k: int):
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3].reshape(-1, 3)
    alpha = rgba[..., 3].reshape(-1)
    nt = alpha > 0
    hsv = C.rgb_u8_to_hsv_cv(rgb)
    hsv_n = jnp.stack(
        [hsv[..., 0] / 179.0 * 2.0, hsv[..., 1] / 255.0 * 1.5, hsv[..., 2] / 255.0],
        axis=-1,
    )
    wts = fit_mask.astype(jnp.float32)
    # RGB-space cluster centers = mean RGB of members (:996-1002)
    centers_rgb, labels = _cluster_mean_rgb(hsv_n, rgb, wts, centers_hsv, k)
    centers_u8 = jnp.clip(centers_rgb, 0, 255).astype(jnp.uint8)
    # Black (filtered-out) pixels -> nearest center in RGB (:1016-1021)
    rgb_f = rgb.astype(jnp.float32)
    rgb_labels = KM.assign_labels(rgb_f, centers_u8.astype(jnp.float32))
    final_labels = jnp.where(fit_mask, labels, rgb_labels)
    mapped = centers_u8[final_labels]
    out = jnp.where(nt[:, None], mapped, jnp.zeros_like(mapped))
    return centers_u8, out.reshape(h, w, 3)


def simplify_colors_perceptual_fast(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
    color_tolerance: float = 30.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """LAB k-means over downsampled unique colors (color_simplify.py:562-707)."""
    _validate_rgba(rgba)
    h, w = rgba.shape[:2]
    x = jnp.asarray(rgba)
    if int(np.asarray(jnp.sum(x[..., 3] > 0))) == 0:
        return _fallback(rgba)

    # Downsample to <= 512 max-dim with INTER_AREA (:608-614)
    max_dim = DEFAULTS.perceptual_fast_max_dim
    if h > max_dim or w > max_dim:
        nh, nw = RZ.scale_to_max_dim(h, w, max_dim)
        rgb_small = RZ.resize_u8(x[..., :3], (nh, nw), RZ.AREA)
        alpha_small = RZ.resize_u8(x[..., 3], (nh, nw), RZ.AREA)
        if int(np.asarray(jnp.sum(alpha_small > 0))) == 0:
            return _fallback(rgba)
    else:
        rgb_small, alpha_small = x[..., :3], x[..., 3]

    # Unique colors among a <=5000-pixel sample (:632-640); we sample with a
    # fixed seed (reference is unseeded np.random — nondeterministic).
    vals, counts, n_unique, n_f30, n_f10 = _pf_unique(rgb_small, alpha_small)
    uniq = np.asarray(C.unpack_rgb_u32(vals))  # (cap, 3) u8, sorted
    n_unique = int(n_unique)
    counts = np.asarray(counts)

    # black filter on unique colors (:644-654)
    bright = uniq[:n_unique].astype(np.float64).mean(axis=1)
    mask = bright > 30
    if mask.sum() < num_colors:
        mask = bright > 10
    if mask.sum() == 0:
        mask = np.ones(n_unique, dtype=bool)
    filt = uniq[:n_unique][mask]

    actual_k = min(num_colors, len(filt))
    if actual_k < 2:
        return _fallback(rgba)

    lab = np.asarray(_rgba_lab(jnp.asarray(filt)))
    centers_lab = np.asarray(
        _kmeans_fit_points(jnp.asarray(lab), jnp.ones((len(lab),), jnp.float32),
                           actual_k, max_iter=100)
    )
    centers_rgb = np.asarray(C.lab_to_rgb_u8(jnp.asarray(centers_lab)))

    # Map all full-res non-transparent pixels in LAB space (:684-695)
    quantized_rgb = np.asarray(_map_in_lab(x, jnp.asarray(centers_lab),
                                           jnp.asarray(centers_rgb)))
    alpha = np.asarray(_alpha_out(x[..., 3], jnp.bool_(preserve_alpha)))
    return np.dstack([quantized_rgb, alpha]), centers_rgb


@jax.jit
def _pf_unique(rgb_small: jnp.ndarray, alpha_small: jnp.ndarray):
    """Sampled unique colors of non-transparent small-image pixels."""
    flat = rgb_small.reshape(-1, 3)
    nt = alpha_small.reshape(-1) > 0
    n = flat.shape[0]
    sample_cap = DEFAULTS.perceptual_fast_max_samples
    key = jax.random.PRNGKey(DEFAULTS.kmeans_seed)
    # Sample <=5000 of the valid pixels: random priority, keep top-5000.
    pri = jax.random.uniform(key, (n,))
    pri = jnp.where(nt, pri, 2.0)
    thresh = jnp.sort(pri)[jnp.minimum(sample_cap, n) - 1]
    sampled = nt & (pri <= thresh)
    packed = C.pack_rgb_u32(flat)
    vals, counts, n_unique = U.packed_unique(packed, sampled, cap=8192)
    bright = jnp.mean(C.unpack_rgb_u32(vals).astype(jnp.float32), axis=1)
    valid = jnp.arange(vals.shape[0]) < n_unique
    return (vals, counts, n_unique,
            jnp.sum(valid & (bright > 30)), jnp.sum(valid & (bright > 10)))


@jax.jit
def _map_in_lab(rgba: jnp.ndarray, centers_lab: jnp.ndarray,
                centers_rgb_u8: jnp.ndarray):
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3].reshape(-1, 3)
    nt = rgba[..., 3].reshape(-1) > 0
    lab = C.rgb_u8_to_lab(rgb)
    labels = KM.assign_labels(lab, centers_lab.astype(jnp.float32))
    mapped = centers_rgb_u8[labels]
    out = jnp.where(nt[:, None], mapped, jnp.zeros_like(mapped))
    return out.reshape(h, w, 3)


def simplify_colors_custom_palette(
    rgba: np.ndarray,
    custom_palette: np.ndarray,
    preserve_alpha: bool = True,
    distance_metric: str = "lab",
) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-palette mapping (reference color_simplify.py:1039-1123)."""
    _validate_rgba(rgba)
    if custom_palette.dtype != np.uint8 or custom_palette.ndim != 2 or custom_palette.shape[1] != 3:
        raise ValueError("custom_palette must be Nx3 uint8")
    x = jnp.asarray(rgba)
    if int(np.asarray(jnp.sum(x[..., 3] > 0))) == 0:
        return rgba, custom_palette
    out = np.asarray(_custom_palette_map(x, jnp.asarray(custom_palette), distance_metric))
    alpha = np.asarray(_alpha_out(x[..., 3], jnp.bool_(preserve_alpha)))
    return np.dstack([out, alpha]), custom_palette


@functools.partial(jax.jit, static_argnames=("metric",))
def _custom_palette_map(rgba: jnp.ndarray, palette: jnp.ndarray, metric: str):
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3].reshape(-1, 3)
    nt = rgba[..., 3].reshape(-1) > 0
    if metric == "lab":
        pts, pal = C.rgb_u8_to_lab(rgb), C.rgb_u8_to_lab(palette)
    elif metric == "hsv":
        pts, pal = C.rgb_u8_to_hsv_cv(rgb), C.rgb_u8_to_hsv_cv(palette)
    else:
        pts, pal = rgb.astype(jnp.float32), palette.astype(jnp.float32)
    labels = KM.assign_labels(pts, pal)
    mapped = palette[labels]
    out = jnp.where(nt[:, None], mapped, jnp.zeros_like(mapped))
    return out.reshape(h, w, 3)


def get_color_statistics(rgba: np.ndarray) -> dict:
    """Statistics dict with the exact reference keys (color_simplify.py:345-384)."""
    _validate_rgba(rgba)
    n_unique, n_nt, mean, std = _stats_core(jnp.asarray(rgba))
    n_nt = int(n_nt)
    if n_nt > 0:
        rgb_mean, rgb_std = np.asarray(mean), np.asarray(std)
    else:
        rgb_mean, rgb_std = np.array([0, 0, 0]), np.array([0, 0, 0])
    return {
        "total_unique_colors": int(n_unique),
        "non_transparent_pixels": n_nt,
        "rgb_mean": rgb_mean,
        "rgb_std": rgb_std,
        "image_size": rgba.shape[:2],
    }


def create_palette_from_colors(colors: List[Tuple[int, int, int]]) -> np.ndarray:
    """(reference color_simplify.py:1126-1141)"""
    return np.array(colors, dtype=np.uint8)


def check_gpu_availability() -> dict:
    """Accelerator probe. Same keys as the reference (color_simplify.py:1144-1187)
    plus TPU fields; on this framework the accelerator is the TPU mesh."""
    info = {
        "cupy_available": False,
        "pytorch_available": False,
        "cuda_available": False,
        "gpu_count": 0,
        "gpu_names": [],
        "tpu_available": False,
        "tpu_count": 0,
    }
    try:
        devs = [d for d in jax.devices() if d.platform in ("tpu", "axon")]
        if devs:
            info["tpu_available"] = True
            info["tpu_count"] = len(devs)
            info["gpu_count"] = len(devs)
            info["gpu_names"] = [str(d) for d in devs]
    except Exception:
        pass
    try:
        import torch  # noqa: F401

        info["pytorch_available"] = True
        if torch.cuda.is_available():  # pragma: no cover
            info["cuda_available"] = True
    except ImportError:
        pass
    return info


def get_recommended_algorithm(image_size: tuple, gpu_available: bool = False) -> str:
    """Size-based auto-selection (reference color_simplify.py:1190-1219)."""
    h, w = image_size
    total_pixels = h * w
    if total_pixels > 1000000:
        return "perceptual" if gpu_available else "perceptual_fast"
    elif total_pixels > 500000:
        return "perceptual_fast"
    elif total_pixels > 100000:
        return "hsv_clustering"
    else:
        return "kmeans"


def simplify_colors_adaptive(
    rgba: np.ndarray,
    target_colors: int = 8,
    preserve_alpha: bool = True,
    algorithm: str = "kmeans",
) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatcher (reference color_simplify.py:280-342)."""
    from image_segmenter_tpu.compat import _quantize_extra as QX

    if algorithm == "kmeans":
        return simplify_colors_kmeans(rgba, target_colors, preserve_alpha)
    elif algorithm == "median_cut":
        return QX.simplify_colors_median_cut(rgba, target_colors, preserve_alpha)
    elif algorithm == "octree":
        return QX.simplify_colors_octree(rgba, target_colors, preserve_alpha)
    elif algorithm == "threshold":
        return simplify_colors_threshold(rgba, target_colors, preserve_alpha)
    elif algorithm == "perceptual":
        return QX.simplify_colors_perceptual(rgba, target_colors, preserve_alpha)
    elif algorithm == "perceptual_fast":
        return simplify_colors_perceptual_fast(rgba, target_colors, preserve_alpha)
    elif algorithm == "adaptive_distance":
        return QX.simplify_colors_adaptive_distance(rgba, target_colors, preserve_alpha)
    elif algorithm == "hsv_clustering":
        return simplify_colors_hsv_clustering(rgba, target_colors, preserve_alpha)
    elif algorithm == "custom_palette":
        raise ValueError("Custom palette requires palette parameter")
    elif algorithm == "adaptive":
        stats = get_color_statistics(rgba)
        total_colors = stats["total_unique_colors"]
        if total_colors <= target_colors:
            return simplify_colors_threshold(rgba, target_colors, preserve_alpha)
        elif total_colors > 1000:
            return QX.simplify_colors_perceptual(rgba, target_colors, preserve_alpha)
        else:
            return simplify_colors_hsv_clustering(rgba, target_colors, preserve_alpha)
    else:
        return simplify_colors_kmeans(rgba, target_colors, preserve_alpha)


# Re-exported by the dispatcher once their solvers land; defined in
# _quantize_extra to keep this module importable while the suite grows.
def simplify_colors_median_cut(rgba, num_colors=8, preserve_alpha=True):
    from image_segmenter_tpu.compat import _quantize_extra as QX
    return QX.simplify_colors_median_cut(rgba, num_colors, preserve_alpha)


def simplify_colors_octree(rgba, num_colors=8, preserve_alpha=True):
    from image_segmenter_tpu.compat import _quantize_extra as QX
    return QX.simplify_colors_octree(rgba, num_colors, preserve_alpha)


def simplify_colors_perceptual(rgba, num_colors=8, preserve_alpha=True,
                               color_tolerance=30.0, use_gpu=False,
                               max_samples=10000):
    from image_segmenter_tpu.compat import _quantize_extra as QX
    return QX.simplify_colors_perceptual(rgba, num_colors, preserve_alpha,
                                         color_tolerance, use_gpu, max_samples)


def simplify_colors_adaptive_distance(rgba, num_colors=8, preserve_alpha=True,
                                      similarity_threshold=25.0):
    from image_segmenter_tpu.compat import _quantize_extra as QX
    return QX.simplify_colors_adaptive_distance(rgba, num_colors, preserve_alpha,
                                                similarity_threshold)
