"""Halo exchange for row-sharded stencil ops (shard_map + ppermute).

The structural analog of ring/context parallelism for images (SURVEY.md §5
"Long-context"): the H axis shards across the `space` mesh axis and every
stencil op (matting Laplacian window sums, morphology, CC sweeps, majority
voting) sees `halo` ghost rows from each neighbor, exchanged over ICI with
`lax.ppermute` neighbor rings. This replaces the reference's lossy shrink
strategy (downsample >1024, sample pixels) with scale-out.
"""

from __future__ import annotations



import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from image_segmenter_tpu.parallel.mesh import SPACE_AXIS


def exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = SPACE_AXIS):
    """Inside shard_map: return x extended with `halo` ghost rows from each
    neighbor along axis_name (zero rows at the chain ends).

    x: (H_local, ...) -> (H_local + 2*halo, ...).
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    top_rows = lax.slice_in_dim(x, 0, halo, axis=0)
    bot_rows = lax.slice_in_dim(x, x.shape[0] - halo, x.shape[0], axis=0)

    # send my top rows UP (to idx-1) so they become the lower ghost of idx-1;
    # send my bottom rows DOWN (to idx+1) as its upper ghost.
    from_below = lax.ppermute(top_rows, axis_name,
                              [(i, (i - 1) % n) for i in range(n)])
    from_above = lax.ppermute(bot_rows, axis_name,
                              [(i, (i + 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(top_rows)
    upper_ghost = jnp.where(idx > 0, from_above, zeros)      # rows above me
    lower_ghost = jnp.where(idx < n - 1, from_below, zeros)  # rows below me
    return jnp.concatenate([upper_ghost, x, lower_ghost], axis=0)


def sharded_stencil(fn, halo: int, mesh: Mesh, axis_name: str = SPACE_AXIS):
    """Wrap a per-shard stencil fn((H_loc+2*halo, W[, C])) -> (H_loc+2*halo,
    W[, C']) into a row-sharded whole-image op.

    fn must be shift-invariant with footprint <= halo; its output's ghost
    rows are discarded. Returns a function on fully-addressable arrays laid
    out as (H, W[, C]) sharded along H.
    """
    spec_in = P(axis_name, None, None)
    spec_out = P(axis_name, None, None)

    def local(x):
        ext = exchange_rows(x, halo, axis_name)
        out = fn(ext)
        return lax.slice_in_dim(out, halo, out.shape[0] - halo, axis=0)

    return shard_map(local, mesh=mesh, in_specs=(spec_in,), out_specs=spec_out)
