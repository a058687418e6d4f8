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


def _sym_inv3(m00, m01, m02, m11, m12, m22):
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c11 = m00 * m22 - m02 * m02
    c12 = m01 * m02 - m00 * m12
    c22 = m00 * m11 - m01 * m01
    det = m00 * c00 + m01 * c01 + m02 * c02
    inv_det = 1.0 / det
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def _precompute(image: jnp.ndarray, epsilon, radius: int) -> _Precomp:
    img = image.astype(jnp.float32)
    h, w = img.shape[:2]
    ones = jnp.ones((h, w), jnp.float32)
    sh = _shifts(radius)

    n_k = sum(_shift2(ones, dy, dx) for dy, dx in sh)
    mu = sum(_shift2(img, dy, dx) for dy, dx in sh) / n_k[..., None]

    # Centered second moments: sum_j (I_j - mu_k)(I_j - mu_k)^T / n_k.
    acc = [jnp.zeros((h, w), jnp.float32) for _ in range(6)]
    for dy, dx in sh:
        v = _shift2(ones, dy, dx)  # in-bounds indicator
        d = (_shift2(img, dy, dx) - mu) * v[..., None]
        acc[0] += d[..., 0] * d[..., 0]
        acc[1] += d[..., 0] * d[..., 1]
        acc[2] += d[..., 0] * d[..., 2]
        acc[3] += d[..., 1] * d[..., 1]
        acc[4] += d[..., 1] * d[..., 2]
        acc[5] += d[..., 2] * d[..., 2]
    # out-of-bounds contributes mu*mu spuriously via (0 - mu); masked by v.
    s00, s01, s02, s11, s12, s22 = [a / n_k for a in acc]
    reg = epsilon / n_k
    dinv = _sym_inv3(s00 + reg, s01, s02, s11 + reg, s12, s22 + reg)

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
        quad = jnp.einsum("...i,...ij,...j->...", d, dinv_k, d)
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
    a = jnp.einsum("...ij,...j->...i", dinv, cov / n_k[..., None])
    b = pbar - jnp.einsum("...i,...i->...", a, mu)

    a_pad = _pad_r(a, r)
    b_pad = _pad_r(b, r)
    bs_a = sum(_sl(a_pad, r, dy, dx, h, w) for dy, dx in sh)
    bs_b = sum(_sl(b_pad, r, dy, dx, h, w) for dy, dx in sh)
    return cnt * p - (jnp.einsum("...i,...i->...", bs_a, img) + bs_b)


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
    m_inv = 1.0 / (pre.diag + lam * is_known + 1e-12)

    x0 = trimap.astype(jnp.float32)  # warm start at the trimap
    r0 = b - amv(x0)
    z0 = m_inv * r0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    def cond(state):
        _, r, _, _, it = state
        res = jnp.sqrt(jnp.sum(r * r)) / bnorm
        return (res > rtol) & (it < max_iter)

    def body(state):
        x, r, p, rz, it = state
        ap = amv(p)
        step = rz / jnp.maximum(jnp.sum(p * ap), 1e-30)
        x = x + step * p
        r = r - step * ap
        z = m_inv * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return x, r, z + beta * p, rz_new, it + 1

    x, r, _, _, it = lax.while_loop(cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
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
