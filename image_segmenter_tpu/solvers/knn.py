"""Blocked nearest-neighbor search on the MXU.

Replaces sklearn pairwise_distances_argmin_min / NearestNeighbors(n=1) used
throughout the reference quantizers (color_simplify.py:544,692,799-801,
866,1020,1107). Queries stream through in fixed blocks; each block is one
(B, D) x (D, Nr) matmul plus an argmin — no KD-trees, no data-dependent
shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BLOCK = 1 << 14


@jax.jit
def nearest_index(queries: jnp.ndarray, refs: jnp.ndarray,
                  ref_valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest valid reference point for each query.

    queries: (Nq, D) float32. refs: (Nr, D) float32. ref_valid: (Nr,) bool.
    Returns (Nq,) int32. Ties break to the smallest index (argmin-first),
    matching numpy/sklearn argmin behavior.
    """
    nq, d = queries.shape
    nb = -(-nq // _BLOCK)
    pad = nb * _BLOCK - nq
    q = jnp.concatenate([queries.astype(jnp.float32),
                         jnp.zeros((pad, d), jnp.float32)]) if pad else queries.astype(jnp.float32)
    q = q.reshape(nb, _BLOCK, d)
    r = refs.astype(jnp.float32)
    r2 = jnp.sum(r * r, axis=1)

    def block(qb):
        d2 = (
            jnp.sum(qb * qb, 1, keepdims=True)
            - 2.0 * lax.dot_general(qb, r.T, (((1,), (0,)), ((), ())),
                                    precision=lax.Precision.HIGHEST)
            + r2[None, :]
        )
        d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    return lax.map(block, q).reshape(-1)[:nq]
