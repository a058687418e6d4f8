"""Pallas TPU kernel: 256-bin u8 histogram in one pass over the data.

XLA lowers the broadcast-compare-reduce histogram (ops/histogram.py) to
several full passes over the input (~20 ms for 4 x 8.3 MP u8 inside the 4K
pipeline's Otsu stage — ~2.5x its compute bound). This kernel reads each
(256, 128) block once and counts all 256 bins against it in VMEM — bins
live on SUBLANES (broadcasted_iota row index), each of the block's 256
data rows is compared against the whole bin column per `fori_loop` step —
emitting per-block partial histograms that a cheap XLA reduction folds.

vmap-safe BY CONSTRUCTION: no cross-grid-step accumulation and no
program_id dependence, so batching just prepends a grid dimension (the
same property pallas_quantize relies on under the dp-sharded pipeline).
Off-TPU callers keep the XLA compare-reduce — the interpreter would be
orders slower and CPU XLA handles the broadcast fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_ROWS = 256
_LANES = 128


def _kernel(x_ref, out_ref):
    bins = lax.broadcasted_iota(jnp.int32, (_BLK_ROWS, _LANES), 0)

    def body(c, acc):
        # Mosaic requires provably 8-aligned sublane reads: fetch an
        # aligned 8-row chunk from the ref, then static-slice its rows.
        chunk = x_ref[pl.ds(pl.multiple_of(c * 8, 8), 8), :].astype(jnp.int32)
        for j in range(8):
            acc = acc + (chunk[j:j + 1, :] == bins).astype(jnp.float32)
        return acc

    acc = lax.fori_loop(
        0, _BLK_ROWS // 8, body,
        jnp.zeros((_BLK_ROWS, _LANES), jnp.float32))
    out_ref[:, :] = acc


_NIB_ROWS = 128  # rows per MXU dot: K = _NIB_ROWS * _LANES per step


def _kernel_nibble(x_ref, out_ref):
    """Nibble-factorized block histogram: the 256-bin count is the 16x16
    JOINT histogram of (value >> 4, value & 15), and a joint count is a
    matmul of one-hot masks — C[a, b] = sum_i M[a, i] * L[b, i] — so the
    256-way bin accumulation runs on the MXU instead of the VPU. Per
    element the VPU builds 2 x 16 one-hot lanes (~32 lane-ops) vs the
    compare-reduce kernel's 512, trading its VPU bound for MXU work the
    systolic array absorbs. Exactness: one-hots are 0/1 in bf16 (exact),
    MXU accumulates f32, per-block counts <= 32768 << 2^24.

    Step size: 128 rows per dot (K=16384). The dot's (16,16) output tile
    underfills the MXU, so per-dot issue overhead dominates at small K —
    the real-chip sweep (bench/micro_hist_nibble.py) measured 8-row steps
    at 5.0 ms / 9.0 ms (single / vmapped b=4 at 8.3M), 128-row at
    2.6 / 6.0, and full-block 256-row REGRESSING to 5.6 ms single (VMEM
    pressure from the (16, 32768) bf16 mask pair).
    """
    iota16 = lax.broadcasted_iota(jnp.int32, (16, _NIB_ROWS * _LANES), 0)

    def body(c, acc):
        chunk = x_ref[pl.ds(pl.multiple_of(c * _NIB_ROWS, _NIB_ROWS),
                            _NIB_ROWS), :].astype(jnp.int32)
        # lay the chunk's rows side by side on lanes: (16, rows*128) masks
        hi = jnp.concatenate(
            [lax.broadcast_in_dim((chunk[j:j + 1, :] >> 4), (16, _LANES),
                                  (0, 1)) for j in range(_NIB_ROWS)], axis=1)
        lo = jnp.concatenate(
            [lax.broadcast_in_dim((chunk[j:j + 1, :] & 15), (16, _LANES),
                                  (0, 1)) for j in range(_NIB_ROWS)], axis=1)
        m = (hi == iota16).astype(jnp.bfloat16)
        l_ = (lo == iota16).astype(jnp.bfloat16)
        return acc + lax.dot_general(
            m, l_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = lax.fori_loop(
        0, _BLK_ROWS // _NIB_ROWS, body, jnp.zeros((16, 16), jnp.float32))
    out_ref[:, :] = jnp.pad(acc, ((0, 0), (0, _LANES - 16)))


@functools.partial(jax.jit, static_argnames=("impl",))
def hist256(flat_u8: jnp.ndarray, impl: str = "nibble") -> jnp.ndarray:
    """256-bin histogram of a flat uint8 array via the one-pass kernel.

    Pads with zeros and subtracts the padding from bin 0. Returns (256,)
    float32 counts. Call on TPU only (see module docstring).

    impl: "nibble" (MXU joint-nibble factorization, _kernel_nibble) or
    "compare" (the VPU compare-reduce kernel). Both are exact integer
    counts and bit-identical on-chip (bench/micro_hist.py, round 4:
    max err 0.0 vs bincount for both). "nibble" is the default after the
    real-chip A/B: 3.23 vs 3.60 ms at 8.3M, 8.87 vs 10.00 ms vmapped b=4.
    """
    if impl not in ("compare", "nibble"):
        raise ValueError(f"unknown hist256 impl: {impl!r}")
    n = flat_u8.shape[0]
    blk = _BLK_ROWS * _LANES
    nb = max(1, -(-n // blk))
    pad = nb * blk - n
    x = flat_u8.reshape(-1)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    x = x.reshape(nb * _BLK_ROWS, _LANES)

    out_rows = 16 if impl == "nibble" else _BLK_ROWS
    partials = pl.pallas_call(
        _kernel_nibble if impl == "nibble" else _kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_BLK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((out_rows, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * out_rows, _LANES), jnp.float32),
        interpret=jax.default_backend() not in ("tpu",),
    )(x)
    # Fold partials in int32: each per-block count is <= 32768 (exact in
    # f32), but the cross-block f32 sum would round once a bin total passes
    # 2^24 (~17 MP of a near-uniform plane), drifting Otsu/quantile results.
    if impl == "nibble":
        # partial block rows: C[hi, lo] in lanes 0..15; bin id = 16*hi + lo
        hist = jnp.sum(
            partials.reshape(nb, 16, _LANES)[:, :, :16].astype(jnp.int32),
            axis=0).reshape(256)
    else:
        hist = jnp.sum(
            partials.reshape(nb, _BLK_ROWS, _LANES).astype(jnp.int32),
            axis=(0, 2))
    # The returned f32 cast rounds a bin ONCE if its exact count exceeds
    # 2^24 (~16.7M same-valued pixels — a near-uniform plane beyond 4x 4K).
    # One final rounding, not accumulated drift: Otsu/quantile consumers
    # (ops/histogram.py) take f32 and are insensitive to a <=2^-24 relative
    # perturbation of one bin mass; callers needing exact counts above 2^24
    # should take the int32 `hist` before this cast.
    return (hist.at[0].add(-pad)).astype(jnp.float32)
