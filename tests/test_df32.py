"""df32 compensated arithmetic vs the f64 oracle.

These tests pin the assumption the whole df32 layer rests on: XLA's
algebraic simplifier leaves the error-free transform sequences intact
(no value-changing float rewrites). If a backend/compiler change ever
breaks that, the exactness tests fail loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.ops import df32 as D


def _rand(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, scale, n)).astype(np.float32)


def test_two_sum_exact_under_jit():
    a = jnp.asarray(_rand(10000, 1.0, 1))
    b = jnp.asarray(_rand(10000, 1e-5, 2))
    s, e = jax.jit(D.two_sum)(a, b)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    assert (got == want).all()
    # the compensation terms must actually be nonzero (a simplifier that
    # rewrote e to 0 would still pass the equality above on exact cases)
    assert (np.asarray(e) != 0).mean() > 0.9


def test_two_prod_exact_under_jit():
    a = jnp.asarray(_rand(10000, 1.0, 3))
    b = jnp.asarray(_rand(10000, 1.0, 4))
    p, e = jax.jit(D.two_prod)(a, b)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    assert (got == want).all()
    assert (np.asarray(e) != 0).mean() > 0.9


@pytest.mark.parametrize("op,npop", [
    (D.add, np.add), (D.sub, np.subtract), (D.mul, np.multiply),
    (D.div, np.divide),
])
def test_df_ops_vs_f64(op, npop):
    # inputs whose hi+lo genuinely carry >f32 precision
    ah = _rand(4096, 1.0, 5)
    al = _rand(4096, 1e-9, 6)
    bh = _rand(4096, 1.0, 7) + 2.0  # keep divisors away from 0
    bl = _rand(4096, 1e-9, 8)
    a = D.DF(jnp.asarray(ah), jnp.asarray(al))
    b = D.DF(jnp.asarray(bh), jnp.asarray(bl))
    out = jax.jit(op)(a, b)
    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    a64 = ah.astype(np.float64) + al.astype(np.float64)
    b64 = bh.astype(np.float64) + bl.astype(np.float64)
    want = npop(a64, b64)
    # df32 error is ~2^-48 relative to the OPERAND magnitude (like any
    # floating point, cancellation in a-b amplifies it relative to the
    # result) — measure against the operand scale.
    scale = np.maximum(np.maximum(np.abs(a64), np.abs(b64)), np.abs(want))
    rel = np.abs(got - want) / np.maximum(scale, 1e-30)
    assert rel.max() < 1e-13, rel.max()


def test_tree_sum_vs_f64():
    x = _rand(1_000_003, 1.0, 9)  # non-power-of-two length, mixed signs
    s = jax.jit(D.tree_sum)(D.df(jnp.asarray(x)))
    got = float(np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64))
    want = x.astype(np.float64).sum()
    assert abs(got - want) / max(abs(want), 1e-30) < 1e-10
    # plain f32 sum is measurably worse on the same data (sanity that the
    # test would catch a silent fallback to naive summation)
    naive = float(np.asarray(x).sum(dtype=np.float32))
    assert abs(got - want) < abs(naive - want)


def test_dot_vs_f64():
    x = _rand(250_000, 1.0, 10)
    y = _rand(250_000, 1.0, 11)
    d = jax.jit(D.dot)(D.df(jnp.asarray(x)), D.df(jnp.asarray(y)))
    got = float(np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64))
    want = float(x.astype(np.float64) @ y.astype(np.float64))
    assert abs(got - want) / max(abs(want), 1e-30) < 1e-10


def test_div_near_cancellation_scale():
    # the matting precompute divides tiny residual sums (~eps=1e-7 scale)
    ah = np.full(128, 1.3e-7, np.float32)
    bh = np.full(128, 1.7e-7, np.float32)
    out = jax.jit(D.div)(D.df(jnp.asarray(ah)), D.df(jnp.asarray(bh)))
    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    want = ah.astype(np.float64) / bh.astype(np.float64)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13
