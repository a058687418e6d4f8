"""Microbench: nibble-histogram kernel step-size variants on the real chip.

Round 4 follow-up to bench/micro_hist.py: the shipped nibble kernel
(kernels/pallas_histogram._kernel_nibble) runs ONE (16,1024)@(1024,16) MXU
dot per 8-row step — 32 dots per 32k block. Its measured 3.2 ms at 8.3M is
far above both the HBM bound (~0.03 ms) and the mask-build VPU bound
(~32 lane-ops/elem ~ 0.3 ms), so the suspect is per-dot overhead / MXU
K-streaming granularity. Variants:

  N8   — shipped kernel (8-row steps, K=1024 per dot)
  N32  — 32-row steps, K=4096 per dot (8 dots/block)
  N3D  — whole-block 3D masks (16,256,128), one dot_general with two
         contracting dims (K=32768) — no fori at all

All must be exact vs np.bincount. Usage: python bench/micro_hist_nibble.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_ROWS = 256
_LANES = 128


def _make_kernel(rows: int):
    def kernel(x_ref, out_ref):
        iota16 = lax.broadcasted_iota(jnp.int32, (16, rows * _LANES), 0)

        def step(chunk, acc):
            hi = jnp.concatenate(
                [lax.broadcast_in_dim((chunk[j:j + 1, :] >> 4), (16, _LANES),
                                      (0, 1)) for j in range(rows)], axis=1)
            lo = jnp.concatenate(
                [lax.broadcast_in_dim((chunk[j:j + 1, :] & 15), (16, _LANES),
                                      (0, 1)) for j in range(rows)], axis=1)
            m = (hi == iota16).astype(jnp.bfloat16)
            l_ = (lo == iota16).astype(jnp.bfloat16)
            return acc + lax.dot_general(
                m, l_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if rows == _BLK_ROWS:
            acc = step(x_ref[:, :].astype(jnp.int32),
                       jnp.zeros((16, 16), jnp.float32))
        else:
            def body(c, acc):
                chunk = x_ref[pl.ds(pl.multiple_of(c * rows, rows), rows),
                              :].astype(jnp.int32)
                return step(chunk, acc)
            acc = lax.fori_loop(0, _BLK_ROWS // rows, body,
                                jnp.zeros((16, 16), jnp.float32))
        out_ref[:, :] = jnp.pad(acc, ((0, 0), (0, _LANES - 16)))
    return kernel


_kernel_n32 = _make_kernel(32)


def _kernel_n3d(x_ref, out_ref):
    chunk = x_ref[:, :].astype(jnp.int32)  # (256, 128)
    iota3 = lax.broadcasted_iota(jnp.int32, (16, _BLK_ROWS, _LANES), 0)
    m = (chunk[None, :, :] >> 4 == iota3).astype(jnp.bfloat16)
    l_ = ((chunk[None, :, :] & 15) == iota3).astype(jnp.bfloat16)
    acc = lax.dot_general(m, l_, (((1, 2), (1, 2)), ((), ())),
                          preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.pad(acc, ((0, 0), (0, _LANES - 16)))


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def hist_variant(flat_u8, kernel, interpret=False):
    n = flat_u8.shape[0]
    blk = _BLK_ROWS * _LANES
    nb = max(1, -(-n // blk))
    pad = nb * blk - n
    x = flat_u8.reshape(-1)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    x = x.reshape(nb * _BLK_ROWS, _LANES)
    partials = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_BLK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 16, _LANES), jnp.float32),
        interpret=interpret,
    )(x)
    hist = jnp.sum(partials.reshape(nb, 16, _LANES)[:, :, :16].astype(jnp.int32),
                   axis=0).reshape(256)
    return (hist.at[0].add(-pad)).astype(jnp.float32)


def timed(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:34s} {best * 1e3:8.3f} ms", flush=True)
    return out


def main():
    interpret = jax.default_backend() not in ("tpu",)
    n = 2160 * 3840 if not interpret else 4 * _BLK_ROWS * _LANES
    rng = np.random.default_rng(0)
    xh = rng.integers(0, 256, n, dtype=np.uint8)
    x = jnp.asarray(xh)
    ref = np.bincount(xh, minlength=256).astype(np.float32)

    from image_segmenter_tpu.kernels.pallas_histogram import hist256

    variants = [(f"N{r}", functools.partial(hist_variant,
                                            kernel=_make_kernel(r),
                                            interpret=interpret))
                for r in (32, 64, 128, 256)]
    variants.append(("N3D", functools.partial(hist_variant, kernel=_kernel_n3d,
                                              interpret=interpret)))
    for label, fn in variants:
        try:
            out = fn(x)
            err = np.abs(np.asarray(out) - ref).max()
            print(f"{label} max err vs bincount: {err}", flush=True)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        if not interpret:
            timed(f"{label} 8.3M", fn, x)

    if interpret:
        return
    timed("N8 (shipped) 8.3M", functools.partial(hist256, impl="nibble"), x)
    y = jnp.asarray(rng.integers(0, 256, (4, n), dtype=np.uint8))
    for label, fn in variants:
        try:
            timed(f"{label} vmapped b4", jax.jit(jax.vmap(fn)), y, reps=5)
        except Exception as e:
            print(f"{label} vmap FAILED: {type(e).__name__}", flush=True)
    timed("N8 (shipped) vmapped b4",
          jax.jit(jax.vmap(functools.partial(hist256, impl="nibble"))), y,
          reps=5)


if __name__ == "__main__":
    main()
