"""Perceptual (Ward/LAB) and adaptive-distance (DBSCAN) quantizers.

Implements the two heaviest reference algorithms over the TPU solvers:

- simplify_colors_perceptual (reference color_simplify.py:387-559):
  unique sampled colors -> exact Ward clustering in LAB (solvers.agglomerative
  NN-chain) -> frequency-weighted RGB centers -> full-image LAB nearest-center
  map. The reference's use_gpu path is vestigial (it round-trips cupy->numpy
  and runs sklearn, :483-505); here use_gpu is accepted and ignored — the TPU
  always runs the real path.

- simplify_colors_adaptive_distance (reference color_simplify.py:710-882):
  standardized-LAB DBSCAN (solvers.dbscan over deduplicated colors with
  multiplicities) -> noise adoption -> k-means rescue (<k) or smallest-into-
  nearest merging (>k) -> pixel-weighted RGB centers -> black-pixel adoption.

bug_compat=True reproduces perceptual's mapping of LAB pixels against RGB
centers (color_simplify.py:544); by default the map compares LAB to LAB.
"""

from __future__ import annotations

import functools
import time
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.config import DEFAULTS
from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.ops import unique as U
from image_segmenter_tpu.solvers import agglomerative as AG
from image_segmenter_tpu.solvers import dbscan as DB
from image_segmenter_tpu.solvers import kmeans as KM
from image_segmenter_tpu.solvers import knn as NN


# Stage attribution of the most recent adaptive_distance call (read by
# bench/baseline_configs.py config 3; same convention as
# solvers/matting.LAST_SOLVE_INFO).
LAST_SOLVE_INFO: dict = {}


def _validate_rgba(rgba: np.ndarray) -> None:
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")


def _fallback(rgba: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return rgba, np.array([[0, 0, 0]])


def _alpha_out_np(alpha: np.ndarray, preserve: bool) -> np.ndarray:
    return alpha if preserve else ((alpha > 128).astype(np.uint8) * 255)


def _bucket(n: int, lo: int = 512, hi: int = 1 << 16) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return b


# --------------------------------------------------------------------------
# shared jitted cores
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cap", "sample_cap"))
def _sampled_unique(rgba: jnp.ndarray, cap: int, sample_cap: int):
    """Unique colors (+counts) among a seeded <=sample_cap pixel sample of the
    non-transparent pixels (reference samples with unseeded np.random)."""
    flat = rgba[..., :3].reshape(-1, 3)
    nt = rgba[..., 3].reshape(-1) > 0
    n = flat.shape[0]
    key = jax.random.PRNGKey(DEFAULTS.kmeans_seed)
    pri = jax.random.uniform(key, (n,))
    pri = jnp.where(nt, pri, 2.0)
    kth = jnp.sort(pri)[jnp.minimum(sample_cap, n) - 1]
    sampled = nt & (pri <= kth)
    packed = C.pack_rgb_u32(flat)
    vals, counts, n_unique = U.packed_unique(packed, sampled, cap=cap)
    return vals, counts, n_unique, jnp.sum(nt)


@functools.partial(jax.jit, static_argnames=("cap",))
def _all_unique_nt(rgba: jnp.ndarray, cap: int):
    """Unique colors (+counts) of ALL non-transparent pixels."""
    flat = rgba[..., :3].reshape(-1, 3)
    nt = rgba[..., 3].reshape(-1) > 0
    packed = C.pack_rgb_u32(flat)
    vals, counts, n_unique = U.packed_unique(packed, nt, cap=cap)
    return vals, counts, n_unique, jnp.sum(nt)


@functools.partial(jax.jit, static_argnames=("k", "bug_compat"))
def _map_lab_centers(rgba: jnp.ndarray, centers_rgb_u8: jnp.ndarray, k: int,
                     bug_compat: bool):
    """Map non-transparent pixels to nearest center in LAB space.

    bug_compat reproduces color_simplify.py:544: LAB pixel coordinates
    compared against *RGB* center coordinates.
    """
    h, w = rgba.shape[:2]
    rgb = rgba[..., :3].reshape(-1, 3)
    nt = rgba[..., 3].reshape(-1) > 0
    lab = C.rgb_u8_to_lab(rgb)
    cmp_centers = (centers_rgb_u8.astype(jnp.float32) if bug_compat
                   else C.rgb_u8_to_lab(centers_rgb_u8))
    labels = KM.assign_labels(lab, cmp_centers)
    mapped = centers_rgb_u8[labels]
    out = jnp.where(nt[:, None], mapped, jnp.zeros_like(mapped))
    return out.reshape(h, w, 3)


@jax.jit
def _map_fixed_labels(rgba: jnp.ndarray, uniq_vals: jnp.ndarray,
                      color_label: jnp.ndarray, palette_u8: jnp.ndarray):
    """Map pixels via their unique-color index (binary search), like
    _quantize_extra._map_via_unique but zeroing transparent pixels."""
    h, w = rgba.shape[:2]
    packed = C.pack_rgb_u32(rgba[..., :3]).reshape(-1)
    nt = rgba[..., 3].reshape(-1) > 0
    pos = jnp.clip(jnp.searchsorted(uniq_vals, packed), 0, uniq_vals.shape[0] - 1)
    lbl = color_label[pos]
    mapped = palette_u8[lbl]
    out = jnp.where(nt[:, None], mapped, jnp.zeros_like(mapped))
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# perceptual (Ward in LAB)
# --------------------------------------------------------------------------

def simplify_colors_perceptual(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
    color_tolerance: float = 30.0,
    use_gpu: bool = False,
    max_samples: int = 10000,
) -> Tuple[np.ndarray, np.ndarray]:
    _validate_rgba(rgba)
    x = jnp.asarray(rgba)
    cap = 1 << 14  # samples <= 10000 -> unique <= 10000 < cap
    vals, counts, n_unique, n_nt = _sampled_unique(x, cap, int(max_samples))
    if int(n_nt) == 0:
        return _fallback(rgba)
    n_unique = int(n_unique)
    uniq = np.asarray(C.unpack_rgb_u32(vals))[:n_unique]
    cnts = np.asarray(counts)[:n_unique]

    # Black filter over unique colors (:453-465)
    bright = uniq.astype(np.float64).mean(axis=1)
    mask = bright > 30
    if mask.sum() < num_colors:
        mask = bright > 10
    if mask.sum() == 0:
        mask = np.ones(n_unique, dtype=bool)
    filt = uniq[mask]
    cnts_f = cnts[mask]

    actual_k = min(num_colors, len(filt))
    if actual_k < 2:
        return _fallback(rgba)

    # Exact Ward on LAB of unique filtered colors (:470-523)
    nbuck = _bucket(len(filt))
    lab = np.asarray(C.rgb_u8_to_lab(jnp.asarray(filt)))
    lab_pad = np.zeros((nbuck, 3), np.float32)
    lab_pad[: len(filt)] = lab
    labels = np.asarray(
        AG.ward_labels(jnp.asarray(lab_pad), jnp.int32(len(filt)), actual_k)
    )[: len(filt)]

    # Frequency-weighted RGB centers (:526-534)
    centers = np.zeros((actual_k, 3), np.float64)
    for i in range(actual_k):
        m = labels == i
        if m.any():
            wsum = cnts_f[m].sum()
            centers[i] = (filt[m].astype(np.float64) * cnts_f[m, None]).sum(0) / max(wsum, 1)
    centers_u8 = np.clip(centers, 0, 255).astype(np.uint8)

    quantized = np.asarray(
        _map_lab_centers(x, jnp.asarray(centers_u8), actual_k, DEFAULTS.bug_compat)
    )
    alpha = _alpha_out_np(rgba[..., 3], preserve_alpha)
    return np.dstack([quantized, alpha]), centers_u8


# --------------------------------------------------------------------------
# adaptive_distance (DBSCAN in standardized LAB)
# --------------------------------------------------------------------------

def simplify_colors_adaptive_distance(
    rgba: np.ndarray,
    num_colors: int = 8,
    preserve_alpha: bool = True,
    similarity_threshold: float = 25.0,
) -> Tuple[np.ndarray, np.ndarray]:
    _validate_rgba(rgba)
    LAST_SOLVE_INFO.clear()
    t0 = time.perf_counter()
    x = jnp.asarray(rgba)
    cap = 1 << 16
    vals, counts, n_unique, n_nt = _all_unique_nt(x, cap)
    if int(n_nt) == 0:
        return _fallback(rgba)
    n_unique = int(n_unique)
    if n_unique > cap:
        n_unique = cap  # extremely colorful image: operate on smallest cap colors
    uniq = np.asarray(C.unpack_rgb_u32(vals))[:n_unique]
    cnts = np.asarray(counts)[:n_unique].astype(np.float64)
    # the np.asarray D2H above is a true fence for ingest+sort-unique
    LAST_SOLVE_INFO["t_ingest_unique"] = time.perf_counter() - t0
    LAST_SOLVE_INFO["n_unique"] = n_unique
    t0 = time.perf_counter()
    lab = np.asarray(C.rgb_u8_to_lab(jnp.asarray(uniq))).astype(np.float64)

    # Pixel-weighted black filter: L > 10, fallback L > 5, fallback all
    # (:763-772 — thresholds apply per pixel; identical colors share L).
    mask = lab[:, 0] > 10
    if (cnts[mask]).sum() < num_colors:
        mask = lab[:, 0] > 5
    if (cnts[mask]).sum() == 0:
        mask = np.ones(n_unique, dtype=bool)
    lab_f = lab[mask]
    rgb_f = uniq[mask].astype(np.float64)
    cnt_f = cnts[mask]
    nf = len(lab_f)

    # StandardScaler over filtered PIXELS == count-weighted over uniques (:782)
    wsum = cnt_f.sum()
    mean = (lab_f * cnt_f[:, None]).sum(0) / wsum
    var = (((lab_f - mean) ** 2) * cnt_f[:, None]).sum(0) / wsum
    std = np.sqrt(np.maximum(var, 1e-12))
    lab_n = (lab_f - mean) / std

    LAST_SOLVE_INFO["t_lab_filter"] = time.perf_counter() - t0
    LAST_SOLVE_INFO["n_filtered"] = nf
    t0 = time.perf_counter()
    eps = (similarity_threshold / 100.0) * 0.5
    nbuck = _bucket(nf)
    pts_pad = np.zeros((nbuck, 3), np.float32)
    pts_pad[:nf] = lab_n
    cnt_pad = np.zeros((nbuck,), np.float32)
    cnt_pad[:nf] = cnt_f
    valid_pad = np.zeros((nbuck,), bool)
    valid_pad[:nf] = True
    db = np.array(
        DB.dbscan_labels(jnp.asarray(pts_pad), jnp.asarray(cnt_pad),
                         jnp.asarray(valid_pad), jnp.float32(eps), jnp.float32(3.0))
    )[:nf]
    LAST_SOLVE_INFO["t_dbscan"] = time.perf_counter() - t0
    t0 = time.perf_counter()

    # Noise -> nearest clustered point's label (:792-802)
    if (db == -1).any() and (db >= 0).any():
        idx = np.asarray(NN.nearest_index(
            jnp.asarray(lab_n[db == -1], jnp.float32),
            jnp.asarray(pts_pad),
            jnp.asarray(valid_pad & (np.pad(db, (0, nbuck - nf), constant_values=-1) >= 0)),
        ))
        db[db == -1] = db[idx]

    cluster_ids = np.unique(db[db >= 0]) if (db >= 0).any() else np.array([], int)
    n_clusters = len(cluster_ids)

    if n_clusters < num_colors:
        # k-means rescue on normalized LAB of all filtered pixels (:809-814)
        res = KM.kmeans_fit(jnp.asarray(pts_pad),
                            jnp.asarray(cnt_pad), num_colors,
                            n_init=DEFAULTS.kmeans_n_init, seed=DEFAULTS.kmeans_seed)
        db = np.asarray(NN.nearest_index(jnp.asarray(lab_n, jnp.float32),
                                         res.centers,
                                         jnp.ones((num_colors,), bool)))
        cluster_ids = np.arange(num_colors)
        n_clusters = num_colors
    elif n_clusters > num_colors:
        # Merge smallest into nearest-by-LAB-centroid large cluster (:817-838)
        sizes = np.array([cnt_f[db == c].sum() for c in cluster_ids])
        order = np.argsort(sizes, kind="stable")
        keep = cluster_ids[order[-num_colors:]]
        merge = cluster_ids[order[:-num_colors]]
        keep_cent = np.array([
            (lab_f[db == c] * cnt_f[db == c, None]).sum(0) / max(cnt_f[db == c].sum(), 1)
            for c in keep
        ])
        for c in merge:
            m = db == c
            cent = (lab_f[m] * cnt_f[m, None]).sum(0) / max(cnt_f[m].sum(), 1)
            tgt = keep[np.argmin(np.linalg.norm(keep_cent - cent, axis=1))]
            db[m] = tgt
        cluster_ids = np.unique(db)
        n_clusters = len(cluster_ids)

    # Final centers: pixel-weighted RGB mean per cluster (:840-848)
    remap = {c: i for i, c in enumerate(np.unique(db))}
    labels_c = np.array([remap[c] for c in db], dtype=np.int32)
    kfin = len(remap)
    centers = np.zeros((kfin, 3), np.float64)
    for i in range(kfin):
        m = labels_c == i
        w = cnt_f[m]
        centers[i] = (rgb_f[m] * w[:, None]).sum(0) / max(w.sum(), 1)
    centers_u8 = np.clip(centers, 0, 255).astype(np.uint8)

    # Black (filtered-out) colors adopt the cluster of their nearest filtered
    # color in (unnormalized) LAB (:861-867).
    full_label = np.zeros(n_unique, np.int32)
    full_label[mask] = labels_c
    if (~mask).any():
        ref_pad = np.zeros((nbuck, 3), np.float32)
        ref_pad[:nf] = lab_f
        nearest = np.asarray(NN.nearest_index(
            jnp.asarray(lab[~mask], jnp.float32), jnp.asarray(ref_pad),
            jnp.asarray(valid_pad)))
        full_label[~mask] = labels_c[nearest]

    LAST_SOLVE_INFO["t_postprocess"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    full_label_pad = np.zeros(cap, np.int32)
    full_label_pad[:n_unique] = full_label
    quantized = np.asarray(_map_fixed_labels(
        x, vals, jnp.asarray(full_label_pad), jnp.asarray(centers_u8)))
    alpha = _alpha_out_np(rgba[..., 3], preserve_alpha)
    LAST_SOLVE_INFO["t_map_d2h"] = time.perf_counter() - t0
    return np.dstack([quantized, alpha]), centers_u8
