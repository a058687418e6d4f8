"""A/B the quantize_map blocking: flat (N/128, 128) reshape (round-2
original) vs 2-D native (H, W) blocks (round-5 relayout-copy fix).

The flat variant's reshape bitcasts pinned {...:T(4,128)} layouts on both
sides of the pallas_call while the kernel refs use the default T(8,128) u8
tiling — the round-5 full-pipeline HLO audit (bench/hlo_attr.py) attributed
8 x 33 MB relayout copies at 4K b=4 to exactly those reshapes. This micro
compiles BOTH variants standalone (vmapped b=4 at 4K), asserts bit-equal
outputs, times them host-transfer fenced, and counts relayout copies in
each compiled HLO via bench/hlo_copies.parse_copies.

Usage: python bench/micro_quantize.py [H W B]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hlo_copies import parse_copies  # noqa: E402
from image_segmenter_tpu.kernels.pallas_quantize import (  # noqa: E402
    _kernel, quantize_map)

_BLK_ROWS, _LANES = 256, 128


@functools.partial(jax.jit, static_argnames=("k_max",))
def quantize_map_flat(rgb_u8, alpha_u8, centers_f32, k_real,
                      brightness_thr, k_max: int = 16):
    """The pre-round-5 flat-reshape blocking, kept here for the A/B."""
    h, w = alpha_u8.shape
    n = h * w
    blk = _BLK_ROWS * _LANES
    nb = -(-n // blk)
    pad = nb * blk - n

    def plane(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(nb * _BLK_ROWS, _LANES)

    r, g, b = (plane(rgb_u8[..., c]) for c in range(3))
    a = plane(alpha_u8)
    cent = jnp.zeros((max(k_max, 8), 128), jnp.float32)
    cent = cent.at[:k_max, :3].set(centers_f32[:k_max])
    meta = jnp.zeros((8, 128), jnp.float32)
    meta = meta.at[0, 0].set(jnp.float32(brightness_thr))
    meta = meta.at[0, 1].set(k_real.astype(jnp.float32))
    bspec = pl.BlockSpec((_BLK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    orp, ogp, obp = pl.pallas_call(
        functools.partial(_kernel, k_max=k_max),
        grid=(nb,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((max(k_max, 8), 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  bspec, bspec, bspec, bspec],
        out_specs=[bspec, bspec, bspec],
        out_shape=[jax.ShapeDtypeStruct((nb * _BLK_ROWS, _LANES), jnp.uint8)
                   for _ in range(3)],
        interpret=jax.default_backend() not in ("tpu",),
    )(meta, cent, r, g, b, a)
    out = jnp.stack([orp.reshape(-1)[:n], ogp.reshape(-1)[:n],
                     obp.reshape(-1)[:n]], axis=-1)
    return out.reshape(h, w, 3)


def copy_mb(lowered_compiled) -> float:
    try:
        hlo = lowered_compiled.as_text()
    except Exception:
        return float("nan")
    return sum(c[4] for c in parse_copies(hlo)) / 1e6


def main():
    h, w, bsz = (int(sys.argv[1]), int(sys.argv[2]),
                 int(sys.argv[3])) if len(sys.argv) > 3 else (2160, 3840, 4)
    k = 16
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.integers(0, 256, (bsz, h, w, 3), np.uint8))
    alpha = jnp.asarray(
        (rng.random((bsz, h, w)) > 0.2).astype(np.uint8) * 255)
    cent = jnp.asarray(rng.integers(0, 256, (k, 3)).astype(np.float32))
    thr = jnp.float32(40.0)
    kr = jnp.int32(k)

    def run_new(rgb, alpha):
        return jax.vmap(lambda r, a: quantize_map(r, a, cent, kr, thr,
                                                  k_max=k))(rgb, alpha)

    def run_flat(rgb, alpha):
        return jax.vmap(lambda r, a: quantize_map_flat(r, a, cent, kr, thr,
                                                       k_max=k))(rgb, alpha)

    out = {}
    for name, fn in [("flat", run_flat), ("2d", run_new)]:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        comp = jfn.lower(rgb, alpha).compile()
        t_comp = time.perf_counter() - t0
        mb = copy_mb(comp)
        res = comp(rgb, alpha)
        _ = np.asarray(res[0, 0, 0])  # host-transfer fence
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            res = comp(rgb, alpha)
            _ = np.asarray(res[0, -1, -1])
            best = min(best, time.perf_counter() - t0)
        out[name] = (best, mb, res)
        print(f"[micro_quantize] {name:4s}: {best * 1e3:8.2f} ms  "
              f"copies={mb:8.1f} MB  (compile {t_comp:.0f} s)")

    same = bool(jnp.all(out["flat"][2] == out["2d"][2]))
    print(f"[micro_quantize] bit-identical outputs: {same}")
    assert same


if __name__ == "__main__":
    main()
