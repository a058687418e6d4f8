"""Closed-form matting: matrix-free Levin Laplacian + Jacobi-preconditioned CG.

Replaces pymatting.estimate_alpha_cf (reference matting_refine.py:9,147-157),
whose numba CG iterates over an assembled sparse matting Laplacian.

TPU-first design — the Laplacian is never assembled. One matvec q = L p is a
fused stencil over the (2r+1)^2 window shifts:

    a_k = Dk^-1 * (1/n_k) sum_{j in w_k} (I_j - mu_k) p_j
    b_k = pbar_k - a_k . mu_k
    (L p)_i = cnt_i p_i - sum_{k contains i} (a_k . I_i + b_k)

(He/Sun/Tang CVPR'10 box-filter identity). Window statistics and the inner
covariance sums are accumulated in CENTERED form — (I_j - mu_k) differences
are taken before any product — because the textbook E[I^2] - mu^2 form
catastrophically cancels in float32 against the eps=1e-7 regularizer on flat
regions, corrupting Dk^-1 by O(1). Centered accumulation keeps everything
exact to f32 rounding. Windows are border-clipped with per-window counts n_k,
matching the Laplacian the tests assemble in scipy as the golden oracle.

The solve runs (L + lam*C) alpha = lam*c_known under a jitted
`lax.while_loop` CG with Jacobi preconditioning, float32 throughout; the host
sees only (alpha, converged, iters, residual).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_LAMBDA = 100.0  # pymatting's known-constraint weight


class _Precomp(NamedTuple):
    image: jnp.ndarray      # (H, W, 3) f32
    valid_n: jnp.ndarray    # (H, W) window size per center (border-clipped)
    cnt: jnp.ndarray        # (H, W) number of windows covering each pixel
    mu: jnp.ndarray         # (H, W, 3) window means
    dinv: jnp.ndarray       # (H, W, 3, 3) (Sigma + eps/n I)^-1
    diag: jnp.ndarray       # (H, W) diag(L)


def _shifts(radius: int):
    return [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]


def _shift2(x: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """out[p] = x[p + (dy,dx)] with constant fill outside. Works (H,W[,C])."""
    h, w = x.shape[:2]
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    start = (max(dy, 0), max(dx, 0))
    if x.ndim == 3:
        pad = pad + ((0, 0),)
        start = start + (0,)
    xp = jnp.pad(x, pad, constant_values=fill)
    return lax.dynamic_slice(xp, start, x.shape)


def _pad_r(x: jnp.ndarray, r: int, fill=0.0) -> jnp.ndarray:
    """Pad H/W by r on all sides once; shifted reads become static slices."""
    pad = ((r, r), (r, r)) + (((0, 0),) if x.ndim == 3 else ())
    return jnp.pad(x, pad, constant_values=fill)


def _sl(xp: jnp.ndarray, r: int, dy: int, dx: int, h: int, w: int) -> jnp.ndarray:
    """Static-slice view of a padded array: out[p] = x[p + (dy,dx)]."""
    return xp[r + dy : r + dy + h, r + dx : r + dx + w]


def _quad3(d, dinv):
    """d' dinv d for (..., 3) vectors against (..., 3, 3) matrices, unrolled
    to VPU elementwise ops (TPU f32 contractions synthesize from bf16 and
    here dinv spans ~9 decades — exact f32 products matter)."""
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    return (dinv[..., 0, 0] * d0 * d0 + dinv[..., 1, 1] * d1 * d1
            + dinv[..., 2, 2] * d2 * d2
            + 2.0 * (dinv[..., 0, 1] * d0 * d1 + dinv[..., 0, 2] * d0 * d2
                     + dinv[..., 1, 2] * d1 * d2))


def _matvec3(dinv, v):
    """dinv @ v, unrolled (see _quad3)."""
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        dinv[..., 0, 0] * v0 + dinv[..., 0, 1] * v1 + dinv[..., 0, 2] * v2,
        dinv[..., 0, 1] * v0 + dinv[..., 1, 1] * v1 + dinv[..., 1, 2] * v2,
        dinv[..., 0, 2] * v0 + dinv[..., 1, 2] * v1 + dinv[..., 2, 2] * v2,
    ], axis=-1)


def _precompute(image: jnp.ndarray, epsilon, radius: int) -> _Precomp:
    """Window stats + (Sigma_k + eps/n I)^-1 per center, f32-stable.

    The inverse is built from an LDL^T factorization of the UNNORMALIZED
    ridge matrix A_k = sum_j d_j d_j' + eps*I (d_j = I_j - mu_k), whose
    pivots and multipliers are accumulated as sums of squares of explicit
    per-pixel regression RESIDUALS (three passes over the window shifts).
    Closed-form routes — adjugate/determinant, or Schur complements taken as
    differences of precomputed moments — catastrophically cancel in f32
    whenever the window covariance is rank-deficient (flat or single-
    gradient regions of real photos: det terms are O(s^2), true value
    O(s*eps^2)), which produced indefinite operators, negative diag(L), and
    diverging CG. Residual accumulation has no cancellation at ANY
    conditioning: every pivot is a nonnegative sum plus explicit ridge
    terms, so the f32 factors track the f64 oracle's to rounding error and
    the SPD bound |dinv| <= 3n/eps holds numerically.
    """
    img = image.astype(jnp.float32)
    h, w = img.shape[:2]
    ones = jnp.ones((h, w), jnp.float32)
    sh = _shifts(radius)
    eps = jnp.float32(epsilon)

    n_k = sum(_shift2(ones, dy, dx) for dy, dx in sh)
    mu = sum(_shift2(img, dy, dx) for dy, dx in sh) / n_k[..., None]

    # pass A: first-channel moments -> l21, l31
    a00 = jnp.zeros((h, w), jnp.float32)
    a01 = jnp.zeros((h, w), jnp.float32)
    a02 = jnp.zeros((h, w), jnp.float32)
    for dy, dx in sh:
        v = _shift2(ones, dy, dx)  # in-bounds indicator
        d = (_shift2(img, dy, dx) - mu) * v[..., None]
        a00 += d[..., 0] * d[..., 0]
        a01 += d[..., 0] * d[..., 1]
        a02 += d[..., 0] * d[..., 2]
    p1 = a00 + eps
    l21 = a01 / p1
    l31 = a02 / p1

    # pass B: residuals of ch2/ch3 on ch1 -> p2, l32
    q22 = jnp.zeros((h, w), jnp.float32)
    q23 = jnp.zeros((h, w), jnp.float32)
    for dy, dx in sh:
        v = _shift2(ones, dy, dx)
        d = (_shift2(img, dy, dx) - mu) * v[..., None]
        r2 = d[..., 1] - l21 * d[..., 0]
        r3 = d[..., 2] - l31 * d[..., 0]
        q22 += v * r2 * r2
        q23 += v * r2 * r3
    # Condition cap: floor the lower pivots at DELTA*p1 so cond(A_k) <= ~1e5.
    # f32 CG's matvec noise is ~5e-7 relative; systems whose smallest window
    # curvature sits below that (flat/quantized images at eps=1e-7) are not
    # f32-solvable AT ALL — uncapped they diverge to inf. The cap deviates
    # from the exact operator only in windows with > sqrt(1/DELTA) ~ 300:1
    # color-spread ratio, where alpha follows the dominant direction and the
    # weak-direction weight is visually irrelevant: measured vs the f64
    # oracle, IoU stays >= 0.991 on every corpus photo INCLUDING the
    # flat-quantized ones that previously fell through to the binarize
    # fallback (delta=1e-4 starts costing accuracy, 1e-6 still diverges).
    _DELTA = jnp.float32(1e-5)
    p2 = jnp.maximum(q22 + eps * (1.0 + l21 * l21), _DELTA * p1)
    l32 = (q23 + eps * l21 * l31) / p2

    # pass C: residual of ch3 on (ch1, ch2) -> p3
    q3 = jnp.zeros((h, w), jnp.float32)
    for dy, dx in sh:
        v = _shift2(ones, dy, dx)
        d = (_shift2(img, dy, dx) - mu) * v[..., None]
        r = (d[..., 2] - l31 * d[..., 0]) - l32 * (d[..., 1] - l21 * d[..., 0])
        q3 += v * r * r
    bq = l21 * l32 - l31
    p3 = jnp.maximum(q3 + eps * (bq * bq + l32 * l32 + 1.0), _DELTA * p1)

    # (Sigma + eps/n I)^-1 = n * A^-1 = n * Linv' diag(1/p) Linv,
    # Linv rows: (1,0,0), (-l21,1,0), (bq,-l32,1)
    i1 = n_k / p1
    i2 = n_k / p2
    i3 = n_k / p3
    inv00 = i1 + l21 * l21 * i2 + bq * bq * i3
    inv01 = -l21 * i2 - bq * l32 * i3
    inv02 = bq * i3
    inv11 = i2 + l32 * l32 * i3
    inv12 = -l32 * i3
    inv22 = i3
    row0 = jnp.stack([inv00, inv01, inv02], axis=-1)
    row1 = jnp.stack([inv01, inv11, inv12], axis=-1)
    row2 = jnp.stack([inv02, inv12, inv22], axis=-1)
    dinv = jnp.stack([row0, row1, row2], axis=-2)

    cnt = n_k  # windows covering a pixel == window size, by symmetry

    # diag(L)_i = cnt_i - sum_{k in w_i} (1 + (Ii-mu_k)' Dk^-1 (Ii-mu_k))/n_k
    diag_sum = jnp.zeros((h, w), jnp.float32)
    for dy, dx in sh:
        # window centered at k = i + (dy,dx)
        v = _shift2(ones, dy, dx)
        mu_k = _shift2(mu, dy, dx)
        dinv_k = _shift2(dinv.reshape(h, w, 9), dy, dx).reshape(h, w, 3, 3)
        n_kk = _shift2(n_k, dy, dx, fill=1.0)
        d = img - mu_k
        quad = _quad3(d, dinv_k)
        diag_sum += v * (1.0 + quad) / n_kk
    diag = cnt - diag_sum
    return _Precomp(img, n_k, cnt, mu, dinv, diag)


def _matvec(pre: _Precomp, p: jnp.ndarray, radius: int) -> jnp.ndarray:
    img, n_k, cnt, mu, dinv = pre.image, pre.valid_n, pre.cnt, pre.mu, pre.dinv
    h, w = p.shape
    r = radius
    sh = _shifts(radius)

    # pad once; every shifted read is a static slice XLA fuses into the adds
    p_pad = _pad_r(p, r)
    img_pad = _pad_r(img, r)
    v_pad = _pad_r(jnp.ones((h, w), jnp.float32), r)

    psum = sum(_sl(p_pad, r, dy, dx, h, w) for dy, dx in sh)
    pbar = psum / n_k
    # centered covariance sum: sum_j (I_j - mu_k) p_j  (exact in f32; the
    # textbook box(I*p) - mu*box(p) form cancels catastrophically vs eps)
    cov = jnp.zeros((h, w, 3), jnp.float32)
    for dy, dx in sh:
        vp = _sl(v_pad, r, dy, dx, h, w) * _sl(p_pad, r, dy, dx, h, w)
        cov += (_sl(img_pad, r, dy, dx, h, w) - mu) * vp[..., None]
    a = _matvec3(dinv, cov / n_k[..., None])
    b = pbar - jnp.sum(a * mu, axis=-1)

    a_pad = _pad_r(a, r)
    b_pad = _pad_r(b, r)
    bs_a = sum(_sl(a_pad, r, dy, dx, h, w) for dy, dx in sh)
    bs_b = sum(_sl(b_pad, r, dy, dx, h, w) for dy, dx in sh)
    return cnt * p - (jnp.sum(bs_a * img, axis=-1) + bs_b)


@functools.partial(jax.jit, static_argnames=("radius", "max_iter", "rtol"))
def solve_alpha_cf(
    image01: jnp.ndarray,
    trimap: jnp.ndarray,
    epsilon=1e-7,
    radius: int = 1,
    lam=_LAMBDA,
    rtol: float = 1e-5,
    max_iter: int = 400,
):
    """Solve (L + lam*C) alpha = lam*known_fg, alpha clipped to [0,1].

    Args:
      image01: (H, W, 3) float in [0, 1].
      trimap: (H, W) float: 0 = BG, 1 = FG, 0.5 = unknown.
    Returns:
      (alpha, converged, iterations, rel_residual)
    """
    pre = _precompute(image01, epsilon, radius)
    is_known = ((trimap < 0.1) | (trimap > 0.9)).astype(jnp.float32)
    known_fg = (trimap > 0.9).astype(jnp.float32)

    def amv(p):
        return _matvec(pre, p, radius) + lam * is_known * p

    b = lam * known_fg
    # diag(L) is mathematically > 0; f32 can round tiny entries negative,
    # which would flip the Jacobi preconditioner's sign — clamp.
    m_inv = 1.0 / jnp.maximum(pre.diag + lam * is_known, 1e-6)

    x0 = trimap.astype(jnp.float32)  # warm start at the trimap
    r0 = b - amv(x0)
    z0 = m_inv * r0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    def cond(state):
        _, r, _, _, it = state
        res = jnp.sqrt(jnp.sum(r * r)) / bnorm
        # a non-finite residual means the system is beyond f32 CG (flat-
        # image + eps=1e-7 conditioning): exit, report not-converged, and
        # let the compat retry ladder (eps=1e-6, then morphological refine —
        # reference matting_refine.py:144-161) take over.
        return (res > rtol) & (it < max_iter) & jnp.isfinite(res)

    def body(state):
        x, r, p, rz, it = state
        ap = amv(p)
        pap = jnp.sum(p * ap)

        # L's smooth near-null modes put p.Ap at the f32 matvec noise floor;
        # stepping along such a direction (curvature ~ rounding error of
        # |p|^2-scale sums) explodes plain CG to inf within a few iterations
        # on flat-image systems. When relative curvature is at noise level,
        # drop the direction: recompute the exact residual and restart from
        # preconditioned steepest descent. Well-conditioned systems (every
        # CNN-alpha trimap measured) never trigger this and run textbook
        # PCG; truly f32-intractable systems exit via the cond's isfinite
        # check into the compat retry ladder (reference :144-161).
        def advance(_):
            step = rz / pap
            return x + step * p, r - step * ap
        def restart(_):
            return x, b - amv(x)
        broke = ~(pap > 1e-10 * jnp.sum(p * p))
        x2, r2 = lax.cond(broke, restart, advance, None)
        z = m_inv * r2
        rz_new = jnp.sum(r2 * z)
        beta = jnp.where(broke, 0.0, rz_new / jnp.maximum(rz, 1e-30))
        return x2, r2, z + beta * p, rz_new, it + 1

    x, r, _, _, it = lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    res = jnp.sqrt(jnp.sum(r * r)) / bnorm
    alpha = jnp.clip(x, 0.0, 1.0)
    return alpha, res <= rtol, it, res


def estimate_alpha_cf(image01, trimap, laplacian_kwargs=None, cg_kwargs=None):
    """pymatting-compatible entry point (reference matting_refine.py:147-157).

    Raises ValueError on non-convergence so the compat layer's retry/fallback
    ladder engages exactly like the reference's except paths.
    """
    import numpy as np

    lk = dict(laplacian_kwargs or {})
    ck = dict(cg_kwargs or {})
    epsilon = float(lk.get("epsilon", 1e-7))
    radius = int(lk.get("radius", 1))
    max_iter = int(ck.get("maxiter", 400))
    alpha, ok, it, res = solve_alpha_cf(
        jnp.asarray(image01, jnp.float32), jnp.asarray(trimap, jnp.float32),
        epsilon=epsilon, radius=radius, max_iter=max_iter)
    if not bool(ok):
        raise ValueError(
            f"closed-form matting CG did not converge: rel_residual={float(res):.3e} "
            f"after {int(it)} iterations")
    return np.asarray(alpha, dtype=np.float64)
