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


@jax.jit
def hist256(flat_u8: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a flat uint8 array via the one-pass kernel.

    Pads with zeros and subtracts the padding from bin 0. Returns (256,)
    float32 counts. Call on TPU only (see module docstring).
    """
    n = flat_u8.shape[0]
    blk = _BLK_ROWS * _LANES
    nb = max(1, -(-n // blk))
    pad = nb * blk - n
    x = flat_u8.reshape(-1)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    x = x.reshape(nb * _BLK_ROWS, _LANES)

    partials = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_BLK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * _BLK_ROWS, _LANES), jnp.float32),
        interpret=jax.default_backend() not in ("tpu",),
    )(x)
    # Fold partials in int32: each per-block count is <= 256 (exact in f32),
    # but the cross-block f32 sum would round once a bin total passes 2^24
    # (~17 MP of a near-uniform plane), drifting Otsu/quantile results.
    hist = jnp.sum(partials.reshape(nb, _BLK_ROWS, _LANES).astype(jnp.int32),
                   axis=(0, 2))
    # The returned f32 cast rounds a bin ONCE if its exact count exceeds
    # 2^24 (~16.7M same-valued pixels — a near-uniform plane beyond 4x 4K).
    # One final rounding, not accumulated drift: Otsu/quantile consumers
    # (ops/histogram.py) take f32 and are insensitive to a <=2^-24 relative
    # perturbation of one bin mass; callers needing exact counts above 2^24
    # should take the int32 `hist` before this cast.
    return (hist.at[0].add(-pad)).astype(jnp.float32)
