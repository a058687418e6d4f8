"""Pallas TPU kernel: fused nearest-palette quantization of an image.

The k-means map phase at 4K makes several full-image passes in stock XLA
(brightness mask, (N,K) distance + argmin, one-hot matmul map, masked where)
— each ~60 ms at 8M pixels on v5e. This kernel does the whole thing in ONE
pass over the pixels: for each block resident in VMEM it computes distances
to all K palette entries (unrolled VPU FMAs over planar u8 channels), tracks
the running argmin and its color, applies the reference's black-filter +
transparency masking, and writes quantized planar u8 — 4 u8 reads + 3 u8
writes per pixel of HBM traffic, nothing else.

Grid: 2-D over (row, lane) blocks of the NATIVE (H, W) channel planes —
not a flat (N/128, 128) reshape. The flat layout looked natural but its
`reshape` bitcasts pinned a `{...:T(4,128)}` layout on both sides of the
pallas_call while the kernel refs use the default `T(8,128)` u8 tiling;
the round-5 HLO copy audit (bench/hlo_attr.py at 4K b=4) attributed 8
relayout copies x 33 MB (~266 MB, the largest u8 copy family in the
device lane) to exactly those reshapes (this file's old lines 85/120).
Blocking the 2-D planes directly keeps producer, kernel, and consumer in
one layout; the channel-extraction slice and the final stack fuse with no
copies. The palette (K <= 256, padded) and the brightness threshold ride
along as small VMEM operands. Falls back to `interpret=True` off-TPU so
CPU tests exercise identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_ROWS = 128   # u8 tiling wants multiples of 32 in the sublane dim
_LANES = 128


def _kernel(meta_ref, cent_ref, r_ref, g_ref, b_ref, a_ref,
            or_ref, og_ref, ob_ref, *, k_max: int):
    # Mosaic has no direct u8<->f32 casts; hop through int32.
    rf = r_ref[:].astype(jnp.int32).astype(jnp.float32)
    gf = g_ref[:].astype(jnp.int32).astype(jnp.float32)
    bf = b_ref[:].astype(jnp.int32).astype(jnp.float32)
    af = a_ref[:].astype(jnp.int32)

    # scalars ride in a VMEM meta tile (SMEM operands break vmap batching)
    thr = meta_ref[0, 0]
    k_real = meta_ref[0, 1]
    best_d = jnp.full(rf.shape, jnp.inf, jnp.float32)
    best_r = jnp.zeros(rf.shape, jnp.float32)
    best_g = jnp.zeros(rf.shape, jnp.float32)
    best_b = jnp.zeros(rf.shape, jnp.float32)
    for k in range(k_max):  # unrolled; padded entries masked by k_real
        cr = cent_ref[k, 0]
        cg = cent_ref[k, 1]
        cb = cent_ref[k, 2]
        d = (rf - cr) ** 2 + (gf - cg) ** 2 + (bf - cb) ** 2
        better = (d < best_d) & (jnp.float32(k) < k_real)
        best_d = jnp.where(better, d, best_d)
        best_r = jnp.where(better, cr, best_r)
        best_g = jnp.where(better, cg, best_g)
        best_b = jnp.where(better, cb, best_b)

    brightness = (rf + gf + bf) * (1.0 / 3.0)
    fit = (af > 0) & (brightness > thr)
    or_ref[:] = jnp.where(fit, best_r, 0.0).astype(jnp.int32).astype(jnp.uint8)
    og_ref[:] = jnp.where(fit, best_g, 0.0).astype(jnp.int32).astype(jnp.uint8)
    ob_ref[:] = jnp.where(fit, best_b, 0.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k_max",))
def quantize_map(rgb_u8: jnp.ndarray, alpha_u8: jnp.ndarray,
                 centers_f32: jnp.ndarray, k_real: jnp.ndarray,
                 brightness_thr: jnp.ndarray, k_max: int = 16) -> jnp.ndarray:
    """Map each pixel to its nearest palette color, zeroing transparent and
    below-threshold (black-filtered) pixels.

    rgb_u8 (H, W, 3), alpha_u8 (H, W), centers_f32 (k_max, 3) (rows >= k_real
    ignored), brightness_thr () f32 (use -1.0 for "no filter").
    Returns (H, W, 3) uint8.
    """
    h, w = alpha_u8.shape
    hp = -(-h // _BLK_ROWS) * _BLK_ROWS
    wp = -(-w // _LANES) * _LANES

    def plane(x):
        # 2-D native: pad (fused, default layout) instead of the flat
        # reshape whose bitcast pinned T(4,128) layouts (module docstring).
        if (hp, wp) != (h, w):
            x = jnp.pad(x, ((0, hp - h), (0, wp - w)))
        return x

    r = plane(rgb_u8[..., 0])
    g = plane(rgb_u8[..., 1])
    b = plane(rgb_u8[..., 2])
    a = plane(alpha_u8)

    cent = jnp.zeros((max(k_max, 8), 128), jnp.float32)
    cent = cent.at[:k_max, :3].set(centers_f32[:k_max])
    meta = jnp.zeros((8, 128), jnp.float32)
    meta = meta.at[0, 0].set(jnp.float32(brightness_thr))
    meta = meta.at[0, 1].set(k_real.astype(jnp.float32))

    grid = (hp // _BLK_ROWS, wp // _LANES)
    bspec = pl.BlockSpec((_BLK_ROWS, _LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((hp, wp), jnp.uint8)
                 for _ in range(3)]

    interpret = jax.default_backend() not in ("tpu",)
    orp, ogp, obp = pl.pallas_call(
        functools.partial(_kernel, k_max=k_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # meta scalars
            pl.BlockSpec((max(k_max, 8), 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # centers
            bspec, bspec, bspec, bspec,
        ],
        out_specs=[bspec, bspec, bspec],
        out_shape=out_shape,
        interpret=interpret,
    )(meta, cent, r, g, b, a)

    return jnp.stack([orp[:h, :w], ogp[:h, :w], obp[:h, :w]], axis=-1)
