"""Double-float32 ("df32") compensated arithmetic for the TPU VPU.

TPU has no native f64 (the XLA:TPU backend rejects or emulates it glacially;
this repo's f64 rungs historically ran on the host CPU — a single core in
this container). But the VPU's f32 elementwise ops ARE correctly-rounded
IEEE, so an unevaluated pair (hi, lo) with |lo| <= ulp(hi)/2 carries ~2^-48
of relative precision — enough to certify the matting solver's rtol=1e-7
contract (reference pymatting runs f64; see solvers/matting.py) while
staying device-resident.

Classic error-free transforms (Dekker 1971, Knuth TAOCP v2): `two_sum` is
branch-free Knuth (no magnitude test — it vectorizes), `two_prod` uses the
Dekker split because XLA exposes no scalar FMA. All algorithms are the
standard double-double kernels restricted to the operations the matting
solver needs (+, -, *, /, compare), specialized to f32 pairs.

XLA caveat verified by tests/test_df32.py: the algebraic simplifier must
not rewrite `(a + b) - a` style sequences. JAX/XLA performs only
value-preserving float rewrites by default, and the exactness tests pin
that assumption on every backend the suite runs on.

TPU flushes f32 subnormals to zero: error terms below ~1.2e-38 are lost.
For the matting solve (values 1e-10..1e2) that floor is ~25 orders below
the 1e-7 certification target — irrelevant, but documented.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DF(NamedTuple):
    """Unevaluated f32 pair: value = hi + lo, |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


_SPLIT = jnp.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32 (p=24)


def two_sum(a, b):
    """s + e == a + b exactly (branch-free Knuth two-sum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker split; no FMA on the VPU ISA via XLA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df(x) -> DF:
    """Lift an f32 array (or DF) to DF."""
    if isinstance(x, DF):
        return x
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def add(a: DF, b: DF) -> DF:
    """Full double-double addition (Knuth): ~2^-48 relative error."""
    s, e = two_sum(a.hi, b.hi)
    t, f = two_sum(a.lo, b.lo)
    e += t
    s, e = fast_two_sum(s, e)
    e += f
    return DF(*fast_two_sum(s, e))


def add_f(a: DF, b) -> DF:
    """DF + f32 array."""
    s, e = two_sum(a.hi, b)
    e += a.lo
    return DF(*fast_two_sum(s, e))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    p, e = two_prod(a.hi, b.hi)
    e += a.hi * b.lo + a.lo * b.hi
    return DF(*fast_two_sum(p, e))


def mul_f(a: DF, b) -> DF:
    """DF * f32 array."""
    p, e = two_prod(a.hi, b)
    e += a.lo * b
    return DF(*fast_two_sum(p, e))


def div(a: DF, b: DF) -> DF:
    """Double-double division (two Newton-ish correction terms)."""
    q1 = a.hi / b.hi
    r = sub(a, mul_f(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, mul_f(b, q2))
    q3 = r.hi / b.hi
    s, e = fast_two_sum(q1, q2)
    return DF(*fast_two_sum(s, e + q3))


def select(pred, a: DF, b: DF) -> DF:
    return DF(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def to_f32(a: DF) -> jnp.ndarray:
    return a.hi + a.lo


def tree_sum(a: DF, axis=None) -> DF:
    """Compensated sum of a DF array via pairwise halving (log-depth tree of
    exact df32 adds): error ~ log2(N) * 2^-48 relative — vs sqrt(N) * 2^-24
    for a plain f32 reduce. Fully vectorized; no scan."""
    hi, lo = a
    if axis is not None:
        raise NotImplementedError("tree_sum reduces all axes")
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    n = hi.shape[0]
    # pad to a power of two with exact zeros
    p = 1 << max(0, (n - 1).bit_length())
    if p != n:
        hi = jnp.concatenate([hi, jnp.zeros((p - n,), hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros((p - n,), lo.dtype)])
    acc = DF(hi, lo)
    while acc.hi.shape[0] > 1:
        m = acc.hi.shape[0] // 2
        acc = add(DF(acc.hi[:m], acc.lo[:m]), DF(acc.hi[m:], acc.lo[m:]))
    return DF(acc.hi[0], acc.lo[0])


def dot(a: DF, b: DF) -> DF:
    """Compensated dot product: elementwise exact products, tree-summed."""
    return tree_sum(mul(a, b))
