"""Portrait matting refinement — reference-compatible API.

Re-implements /root/reference/app/processing/matting_refine.py (168 LoC):
trimap construction ladder, the >1024px downsample/upsample wrapper, the
estimate_alpha_cf retry ladder (basic -> epsilon=1e-6/radius=1 -> simple
morphological refine), and stroke enforcement — over the TPU closed-form
matting solver (solvers/matting.py).
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.config import DEFAULTS
from image_segmenter_tpu.ops import morphology as M
from image_segmenter_tpu.ops import resize as RZ
from image_segmenter_tpu.solvers.matting import estimate_alpha_cf  # noqa: F401 (re-export)


def build_trimap_from_alpha_and_strokes(
    rgba_or_rgb: np.ndarray,
    alpha_init: np.ndarray,
    user_mask: Optional[np.ndarray],
    fg_threshold: int = 220,
    bg_threshold: int = 20,
) -> np.ndarray:
    """Trimap {0, 0.5, 1} float64 (reference matting_refine.py:14-54)."""
    h, w = alpha_init.shape
    trimap = np.full((h, w), 0.5, dtype=np.float64)

    alpha_min, alpha_max = int(alpha_init.min()), int(alpha_init.max())
    if alpha_max - alpha_min > 50:
        trimap[alpha_init >= fg_threshold] = 1.0
        trimap[alpha_init <= bg_threshold] = 0.0
    else:
        trimap[alpha_init >= np.percentile(alpha_init, 80)] = 1.0
        trimap[alpha_init <= np.percentile(alpha_init, 20)] = 0.0

    if user_mask is not None:
        trimap[user_mask == 1] = 1.0
        trimap[user_mask == 2] = 0.0

    if (trimap == 1.0).sum() == 0 or (trimap == 0.0).sum() == 0:
        trimap[alpha_init >= 128] = 1.0
        trimap[alpha_init < 128] = 0.0
        if user_mask is not None:
            trimap[user_mask == 1] = 1.0
            trimap[user_mask == 2] = 0.0

    return trimap


@jax.jit
def _simple_refine_core(alpha_init: jnp.ndarray):
    binary = alpha_init > 128
    se = M.structuring_element(M.ELLIPSE, (3, 3))
    closed = M.close_binary(binary, se)
    opened = M.open_binary(closed, se)
    return opened.astype(jnp.uint8) * 255


def simple_alpha_refine(
    rgb: np.ndarray,
    alpha_init: np.ndarray,
    user_mask: Optional[np.ndarray],
) -> np.ndarray:
    """Morphological fallback refine (reference :57-86)."""
    alpha_sharp = np.array(_simple_refine_core(jnp.asarray(alpha_init)))
    if user_mask is not None:
        alpha_sharp[user_mask == 1] = 255
        alpha_sharp[user_mask == 2] = 0
    return alpha_sharp


def refine_alpha_portrait(
    rgb: np.ndarray,
    alpha_init: np.ndarray,
    user_mask: Optional[np.ndarray],
) -> np.ndarray:
    """Closed-form matting refine with the >1024 shrink rule (reference :89-126).

    The 1024 max-dim downsample is preserved as the default behavior; the
    spatially-sharded full-resolution path lives in pipeline/ (a TPU-only
    capability with no reference counterpart).
    """
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("rgb must be HxWx3 uint8")
    if alpha_init.dtype != np.uint8 or alpha_init.shape[:2] != rgb.shape[:2]:
        raise ValueError("alpha_init must be HxW uint8 matching image")

    h, w = rgb.shape[:2]
    max_dimension = DEFAULTS.matting_max_dim
    if h > max_dimension or w > max_dimension:
        nh, nw = RZ.scale_to_max_dim(h, w, max_dimension)
        rgb_small = np.asarray(RZ.resize_u8(jnp.asarray(rgb), (nh, nw), RZ.AREA))
        alpha_small = np.asarray(RZ.resize_u8(jnp.asarray(alpha_init), (nh, nw), RZ.AREA))
        user_small = None
        if user_mask is not None:
            user_small = np.asarray(
                RZ.resize_u8(jnp.asarray(user_mask), (nh, nw), RZ.NEAREST_CV))
        refined_small = refine_alpha_portrait_small(rgb_small, alpha_small, user_small)
        refined = np.asarray(
            RZ.resize_u8(jnp.asarray(refined_small), (h, w), RZ.LINEAR))
        return refined
    return refine_alpha_portrait_small(rgb, alpha_init, user_mask)


def refine_alpha_portrait_full_res(
    rgb: np.ndarray,
    alpha_init: np.ndarray,
    user_mask: Optional[np.ndarray] = None,
    mesh=None,
) -> np.ndarray:
    """Full-resolution matting via spatial sharding — the TPU replacement for
    the reference's lossy >1024 downsample (matting_refine.py:105-124).

    Image rows shard across the mesh's `space` axis; GSPMD partitions the
    window stencils and CG reductions (halo exchanges + psums over ICI), so a
    4K portrait mats at native resolution instead of being shrunk 4x. With
    mesh=None this is simply the unsharded full-res solve.
    """
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("rgb must be HxWx3 uint8")
    if alpha_init.dtype != np.uint8 or alpha_init.shape[:2] != rgb.shape[:2]:
        raise ValueError("alpha_init must be HxW uint8 matching image")

    trimap = build_trimap_from_alpha_and_strokes(rgb, alpha_init, user_mask)
    img = jnp.asarray(rgb, jnp.float32) / 255.0
    tri = jnp.asarray(trimap, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from image_segmenter_tpu.parallel.mesh import SPACE_AXIS

        img = jax.device_put(img, NamedSharding(mesh, P(SPACE_AXIS, None, None)))
        tri = jax.device_put(tri, NamedSharding(mesh, P(SPACE_AXIS, None)))
        ctx = mesh
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    from image_segmenter_tpu.solvers.matting import solve_alpha_cf

    with ctx:
        alpha, ok, _, _ = solve_alpha_cf(img, tri, max_iter=800, rtol=1e-5)
    if not bool(ok):
        return simple_alpha_refine(rgb, alpha_init, user_mask)
    alpha_u8 = np.clip((np.asarray(alpha, np.float64) * 255.0 + 0.5), 0, 255).astype(np.uint8)
    if user_mask is not None:
        alpha_u8[user_mask == 1] = 255
        alpha_u8[user_mask == 2] = 0
    return alpha_u8


def refine_alpha_portrait_small(
    rgb: np.ndarray,
    alpha_init: np.ndarray,
    user_mask: Optional[np.ndarray],
) -> np.ndarray:
    """(reference :129-168) with the retry/fallback ladder intact."""
    trimap = build_trimap_from_alpha_and_strokes(rgb, alpha_init, user_mask)
    rgb_f = rgb.astype(np.float64) / 255.0

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            alpha_refined = estimate_alpha_cf(rgb_f, trimap)
    except Exception:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                alpha_refined = estimate_alpha_cf(
                    rgb_f, trimap, laplacian_kwargs={"epsilon": 1e-6, "radius": 1})
        except Exception:
            # Third rung (no reference counterpart needed — pymatting is
            # ALWAYS f64, so the reference never sees the f32 failure): the
            # same solver at the reference's precision on the host CPU.
            # Exactly-quantized flat images put the Laplacian's constant-
            # per-region modes below the f32 noise floor; f64 certifies
            # them, so this rung reproduces the reference output on the one
            # input class the TPU-precision rungs cannot solve.
            try:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    alpha_refined = estimate_alpha_cf(rgb_f, trimap, x64=True)
            except Exception as e3:
                print(f"Warning: Advanced portrait matting failed to converge. "
                      f"Using simple refinement. Error: {e3}")
                return simple_alpha_refine(rgb, alpha_init, user_mask)

    # The solver clips alpha to [0,1], so the +0.5 round cannot wrap.
    alpha_u8 = np.clip((alpha_refined * 255.0 + 0.5).astype(np.uint8), 0, 255)
    if user_mask is not None:
        alpha_u8[user_mask == 1] = 255
        alpha_u8[user_mask == 2] = 0
    return alpha_u8
