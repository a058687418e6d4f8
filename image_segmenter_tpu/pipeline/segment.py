"""The flagship pipeline: background removal -> matting refine -> k-means.

This is BASELINE config 5 ("Full pipeline: rembg U^2-Net removal -> matting
refine -> k-means simplify, batched 4K") as ONE jitted program per
(batch, H, W): no host round-trips between stages, every data-dependent
decision of the reference's ladders re-expressed as lax.cond/where.

Scaling: the batch axis shards across the `data` mesh axis (just annotate the
input sharding — stages are per-image except k-means center reductions, which
become psums under GSPMD). The `space` axis shards image rows for the
conv/stencil stages at full resolution.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.config import DEFAULTS
from image_segmenter_tpu.models import registry as REG
from image_segmenter_tpu.ops import histogram as HG
from image_segmenter_tpu.ops import morphology as M
from image_segmenter_tpu.ops import resize as RZ
from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.solvers import kmeans as KM
from image_segmenter_tpu.solvers.matting import solve_alpha_cf


class PipelineOutput(NamedTuple):
    rgba: jnp.ndarray      # (B, H, W, 4) uint8 quantized cutout
    alpha: jnp.ndarray     # (B, H, W) uint8 refined alpha
    palettes: jnp.ndarray  # (B, K, 3) uint8


def _trimap_device(alpha_init: jnp.ndarray) -> jnp.ndarray:
    """The reference trimap ladder (matting_refine.py:14-54) as device ops."""
    a = alpha_init.astype(jnp.float32)
    amin, amax = jnp.min(a), jnp.max(a)
    contrast = (amax - amin) > 50

    # sort-free u8 percentiles (jnp.quantile would sort the plane twice)
    hi_t = jnp.where(contrast, 220.0, HG.u8_quantile(alpha_init, 0.8))
    lo_t = jnp.where(contrast, 20.0, HG.u8_quantile(alpha_init, 0.2))
    tri = jnp.full(a.shape, 0.5, jnp.float32)
    tri = jnp.where(a >= hi_t, 1.0, tri)
    tri = jnp.where(a <= lo_t, 0.0, tri)

    # FG/BG-nonempty fallback -> simple 128 threshold
    need_fb = (jnp.sum(tri == 1.0) == 0) | (jnp.sum(tri == 0.0) == 0)
    fb = jnp.where(a >= 128, 1.0, 0.0)
    return jnp.where(need_fb, fb, tri)


def _sharp_alpha(alpha_u8: jnp.ndarray) -> jnp.ndarray:
    """Otsu + 3x3 ellipse close/open (rembg_infer.py:75-96)."""
    binary = HG.otsu_binarize(alpha_u8)
    se = M.structuring_element(M.ELLIPSE, (3, 3))
    return M.open_binary(M.close_binary(binary, se), se)


def _span_idx(n: int, count: int) -> jnp.ndarray:
    """`count` DISTINCT indices spanning [0, n): the center of each of
    `count` equal buckets. Distinct whenever count <= n — a naive
    clamp(stride//2 + stride*i, n-1) collapses up to half the slots onto
    the last index for n just above `count` (and then never samples the
    skipped rows at all)."""
    return (jnp.arange(count) * n) // count + max(n // (2 * count), 0)


def grid_sample_colors(rgb: jnp.ndarray, fit2d: jnp.ndarray,
                       min_mass: int = 64, cap: int = 1 << 14):
    """Sort-free systematic grid sample of the fit-masked color
    distribution: (sample (cap, 3) f32, weights (cap,) f32).

    A uniform spatial sample IS an unbiased draw from the area-weighted
    color distribution — exactly the estimator sklearn's fit-all-pixels
    computes (an earlier sorted quantile sketch stratified by color but
    spent ~3/4 of its stage sorting 2M keys). Rows-first for the memory
    system: gather ~128 full rows (contiguous reads; a 2-D strided gather
    over the whole 24 MB 4K image measured 17 ms), then column-select the
    small (128, W) result. Drift vs the exact-table fit stays < 5%
    quantization error (tests/test_pipeline.py).

    A uniform grid can miss a thin/sparse foreground entirely (a bright
    band narrower than the row pitch): with ~zero fit weight the k-means
    would collapse to one bogus black center and erase the foreground.
    The repair is BRANCHLESS — this runs under vmap, where lax.cond
    executes BOTH branches (an earlier sort fallback cost 125 ms/batch
    unconditionally, caught by bench/device_trace.py): the row/column
    INDEX SETS are selected per image — uniform when the uniform grid
    catches enough fit mass, else the top-fit-mass rows/columns (top_k
    over h/w-length count vectors, microseconds), with the column-stage
    check catching thin vertical features the row estimate misses.
    """
    h, w = fit2d.shape
    R = min(h, 128)
    ncol = min(w, max(1, cap // R))

    row_cnt = jnp.sum(fit2d, axis=1)                    # (h,)
    uni_rows = _span_idx(h, R)
    mm = jnp.float32(min_mass)
    rows_ok = jnp.sum(row_cnt[uni_rows]) * (jnp.float32(ncol) / w) >= mm
    _, mass_rows = jax.lax.top_k(row_cnt, R)
    row_idx = jnp.where(rows_ok, uni_rows, jnp.sort(mass_rows))

    rows = rgb[row_idx]                                 # (R, w, 3) gather
    rfit = fit2d[row_idx]
    col_cnt = jnp.sum(rfit, axis=0)                     # (w,)
    uni_cols = _span_idx(w, ncol)
    cols_ok = jnp.sum(col_cnt[uni_cols]) >= mm
    _, mass_cols = jax.lax.top_k(col_cnt, ncol)
    col_idx = jnp.where(cols_ok, uni_cols, jnp.sort(mass_cols))

    sample = rows[:, col_idx].reshape(-1, 3).astype(jnp.float32)
    wts = rfit[:, col_idx].reshape(-1).astype(jnp.float32)
    if sample.shape[0] < cap:
        pad = cap - sample.shape[0]
        sample = jnp.pad(sample, ((0, pad), (0, 0)))
        wts = jnp.pad(wts, (0, pad))
    return sample[:cap], wts[:cap]


def _kmeans16_sample(rgb: jnp.ndarray, alpha_mask: jnp.ndarray, k: int):
    """Black-filter ladder + grid color sample for one image. Every
    reduction here is over integer-valued f32 (bool counts) — EXACT under
    any summation order, so the returned sample is identical no matter how
    the image is sharded (the mesh-invariance precondition of
    `_kmeans16_fit`)."""
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    nt = alpha_mask.reshape(-1)
    brightness = jnp.mean(flat.astype(jnp.float32), axis=1)
    # black-filter ladder folded into one threshold: 30 -> 10 -> none
    n30 = jnp.sum(nt & (brightness > 30))
    n10 = jnp.sum(nt & (brightness > 10))
    thr = jnp.where(n30 >= k, 30.0, jnp.where(n10 > 0, 10.0, -1.0))
    fit = nt & (brightness > thr)
    sample, wts = grid_sample_colors(rgb, fit.reshape(h, w),
                                     min_mass=max(k, 64))
    return sample, wts, thr


def _kmeans16_fit(sample: jnp.ndarray, wts: jnp.ndarray, k: int):
    """Weighted Lloyd on the (cap, 3) sample -> u8 centers.

    Throughput pipeline uses the deterministic, sampling-free fit
    (solvers/kmeans.kmeans_fit_det): stratified greedy-potential kmeans++
    seeding + ONE Lloyd run — no PRNG, no restarts. Gated on the corpus at
    parity with the previous 2-restart sampled kmeans++ (worst inertia
    ratio 1.13, mean 1.03, better on 5/15 scenes — round-5 det-fit gate).
    Why it ships: half the fit latency (one seeding pass + one Lloyd vs
    two of each), and mesh-invariance BY CONSTRUCTION — a sampled kmeans++
    draw can in principle flip on one ulp of f32 reduction-order change
    between the 1-device and mesh-partitioned compiles and rewrite the
    whole restart trajectory, where the greedy winner only moves between
    near-tied candidates with near-equal resulting potential. (The
    MULTICHIP_r04 "quant err 445 vs 674" that first motivated this turned
    out to be an evaluation-domain artifact — see __graft_entry__.py — the
    sampled fit had matched bit-for-bit on the flip-free images; det-fit
    keeps that robustness without relying on it.) The compat layer keeps
    sklearn's sampled n_init=10 semantics (color_simplify.py:79
    random_state=42)."""
    centers = KM.kmeans_fit_det(sample, wts, k).centers
    return jnp.clip(centers, 0, 255).astype(jnp.uint8)


def _kmeans16_map(rgb: jnp.ndarray, alpha_mask: jnp.ndarray,
                  thr: jnp.ndarray, centers_u8: jnp.ndarray, k: int):
    """Map every pixel to its nearest center (fused Pallas pass)."""
    import os

    if os.environ.get("ISEG_NO_PALLAS"):
        h, w = rgb.shape[:2]
        flat = rgb.reshape(-1, 3)
        brightness = jnp.mean(flat.astype(jnp.float32), axis=1)
        fit = alpha_mask.reshape(-1) & (brightness > thr)
        labels = KM.assign_labels(flat.astype(jnp.float32),
                                  centers_u8.astype(jnp.float32))
        mapped = KM.map_to_centers(labels, centers_u8)
        out = jnp.where(fit[:, None], mapped, jnp.zeros_like(mapped))
        return out.reshape(h, w, 3)
    # fused assign+map+mask: one pass over the pixels (kernels/pallas_quantize)
    from image_segmenter_tpu.kernels.pallas_quantize import quantize_map

    alpha_u8 = (alpha_mask.astype(jnp.uint8) * 255)
    return quantize_map(rgb, alpha_u8, centers_u8.astype(jnp.float32),
                        jnp.int32(k), thr, k_max=k)


def _kmeans16_quantize(rgb: jnp.ndarray, alpha_mask: jnp.ndarray, k: int):
    """Reference kmeans semantics on one image: black-filter + weighted
    unique-color Lloyd + a single fused Pallas map pass."""
    sample, wts, thr = _kmeans16_sample(rgb, alpha_mask, k)
    centers_u8 = _kmeans16_fit(sample, wts, k)
    return _kmeans16_map(rgb, alpha_mask, thr, centers_u8, k), centers_u8


class StageFns(NamedTuple):
    """The three pipeline phases as separately-jittable batch functions.

    `Pipeline` composes them inside ONE jit (XLA fuses across phase
    boundaries); `pipeline.staged.StagedPipeline` jits each on its own mesh
    sub-group for pipeline parallelism.
    """
    cnn: callable        # (variables, imgs u8 BHW3) -> mask_small u8 (B,nh,nw)
    matting: callable    # (imgs, mask_small) -> (sharp bool BHW, alpha u8 BHW)
    quantize: callable   # (imgs, sharp) -> (rgba u8 BHW4, palettes u8 BK3)


def make_stage_fns(session, k: int, matting_dim: int, cg_iters: int,
                   cnn_sharding=None, kmeans_sharding=None) -> StageFns:
    spec = session.spec
    module = session.module
    nh, nw = spec.size
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    mdim = matting_dim

    def cnn_stage(variables, imgs):
        small = jax.vmap(lambda im: RZ.resize_u8(im, (nh, nw), RZ.LANCZOS_PIL))(imgs)
        if cnn_sharding is not None:
            # Pin the CNN interior to batch-only sharding. Spatially
            # partitioned convolutions change f32 accumulation order at tile
            # boundaries, flipping the u8-quantized saliency by +-1 on ~4% of
            # pixels vs the single-device run; those +-1s cross the discrete
            # trimap thresholds (220/20) and flip matting CONSTRAINTS, which
            # moves alpha by O(1) locally (measured maxdiff 241). The net is
            # tiny at 320x320 — replicating its rows across `space` costs
            # far less than the nondeterminism; sharded-vs-single alpha
            # agreement goes 0.9971 -> >=0.999 (dryrun assert).
            small = jax.lax.with_sharding_constraint(small, cnn_sharding)
        x = small.astype(jnp.float32)
        x = x / jnp.maximum(jnp.max(x, axis=(1, 2, 3), keepdims=True), 1e-6)
        x = (x - mean) / std
        d0 = module.apply(variables, x, train=False)[0][..., 0]
        mi = jnp.min(d0, axis=(1, 2), keepdims=True)
        ma = jnp.max(d0, axis=(1, 2), keepdims=True)
        m01 = (d0 - mi) / jnp.maximum(ma - mi, 1e-12)
        return jnp.clip(jnp.floor(m01 * 255.0 + 0.5), 0, 255).astype(jnp.uint8)

    def matting_one(rgb_u8, mask_small_u8):
        h, w = rgb_u8.shape[:2]
        # upsample netmask to full res (LANCZOS like rembg post)
        alpha0 = RZ.resize_u8(mask_small_u8, (h, w), RZ.LANCZOS_PIL)
        # matting at <= matting_dim (reference shrink rule)
        if h > mdim or w > mdim:
            sh, sw = RZ.scale_to_max_dim(h, w, mdim)
            rgb_s = RZ.resize_u8(rgb_u8, (sh, sw), RZ.AREA)
            a_s = RZ.resize_u8(alpha0, (sh, sw), RZ.AREA)
        else:
            sh, sw = h, w
            rgb_s, a_s = rgb_u8, alpha0
        trimap = _trimap_device(a_s)
        # rtol 1e-4 suffices for uint8 alpha (quantization step 4e-3)
        # half_stats packs the window inverses as f32 LDL factors (24 vs
        # 36 B/px on the operand the CG loop re-reads every iteration);
        # numerically equivalent to the full-matrix path — same iteration
        # counts, uint8-identical alpha (test_factored_stats_storage_
        # equivalent). bf16 factors were evaluated and rejected for
        # accuracy; see solvers/matting.py.
        # warm-start CG at the CNN alpha (already in hand, much closer to
        # the solution than the trimap in the unknown band): ~23% fewer
        # iterations measured across the corpus at this rtol
        alpha_m, _, _, _ = solve_alpha_cf(
            rgb_s.astype(jnp.float32) / 255.0, trimap, max_iter=cg_iters,
            rtol=1e-4, half_stats=True,
            x0=a_s.astype(jnp.float32) / 255.0)
        alpha_m_u8 = jnp.clip(jnp.floor(alpha_m * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
        if (sh, sw) != (h, w):
            alpha_full = RZ.resize_u8(alpha_m_u8, (h, w), RZ.LINEAR)
        else:
            alpha_full = alpha_m_u8
        return _sharp_alpha(alpha_full), alpha_full

    def matting_stage(imgs, mask_small):
        return jax.vmap(matting_one)(imgs, mask_small)

    def quantize_stage(imgs, sharp):
        samples, wts, thrs = jax.vmap(
            lambda im, m: _kmeans16_sample(im, m, k))(imgs, sharp)
        if kmeans_sharding is not None:
            # Pin the k-means fit to batch-only sharding (mesh-invariance,
            # VERDICT r4 item 7): the (b, 16k, 3) sample is tiny, and
            # replicating it across `space` makes every reduction inside
            # the fit single-device-ordered, so the same sample fits
            # identically on 1 chip and on any mesh. Without the pin,
            # space-sharded f32 reductions reorder and could flip a
            # near-tied seeding argmin (det-fit bounds the damage of such
            # a flip to a near-equal-potential candidate; the pin removes
            # the flip entirely).
            samples = jax.lax.with_sharding_constraint(
                samples, kmeans_sharding)
        centers = jax.vmap(lambda s, ww: _kmeans16_fit(s, ww, k))(
            samples, wts)
        qrgb = jax.vmap(lambda im, m, t, c: _kmeans16_map(im, m, t, c, k))(
            imgs, sharp, thrs, centers)
        alpha_out = sharp.astype(jnp.uint8) * 255
        rgba = jnp.concatenate([qrgb, alpha_out[..., None]], axis=-1)
        return rgba, centers

    return StageFns(cnn_stage, matting_stage, quantize_stage)


class Pipeline:
    """Compiled end-to-end pipeline for a fixed model id.

    Use `run(imgs)` with (B, H, W, 3) uint8 RGB batches; compiles once per
    shape. Pass a mesh+sharding via `shardings` to scale across chips.
    """

    def __init__(self, model: str = "u2netp", k: int = 16,
                 matting_dim: Optional[int] = None, cg_iters: int = 200,
                 sharding=None):
        self.session = REG.new_session(model)
        self.k = k
        self.matting_dim = matting_dim or DEFAULTS.matting_max_dim
        self.cg_iters = cg_iters
        self.sharding = sharding
        cnn_sharding = None
        kmeans_sharding = None
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from image_segmenter_tpu.parallel.mesh import DATA_AXIS

            mesh = getattr(sharding, "mesh", None)
            if mesh is not None and DATA_AXIS in mesh.axis_names:
                cnn_sharding = NamedSharding(
                    mesh, P(DATA_AXIS, None, None, None))
                # (b, cap, 3) color samples: batch-sharded, replicated over
                # `space` — see quantize_stage (mesh-invariant k-means).
                kmeans_sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
        stages = make_stage_fns(self.session, self.k, self.matting_dim,
                                self.cg_iters, cnn_sharding=cnn_sharding,
                                kmeans_sharding=kmeans_sharding)

        def batch_fn(variables, imgs):
            mask_small = stages.cnn(variables, imgs)
            sharp, alpha = stages.matting(imgs, mask_small)
            rgba, palettes = stages.quantize(imgs, sharp)
            return PipelineOutput(rgba, alpha, palettes)

        self._fn = jax.jit(batch_fn)

    def run(self, imgs_u8: np.ndarray) -> PipelineOutput:
        x = jnp.asarray(imgs_u8)
        if self.sharding is not None:
            x = jax.device_put(x, self.sharding)
        out = self._fn(self.session.variables, x)
        return out
