"""Device-resident reference-precision matting: the closed-form solve in
compensated double-f32 (ops/df32.py).

Why this exists: the matting contract's high-precision rungs — the warm-
started polish after a certified f32 solve, and the full solve for
quantized-flat images f32 cannot certify (solvers/matting.py,
estimate_alpha_cf) — need ~1e-7-certified residuals against the EXACT-eps
Levin operator (reference pymatting runs f64 CG at rtol 1e-7,
matting_refine.py:147). TPU has no f64, so those rungs ran on the host CPU:
a single core in this container, 0.12 s per f64 matvec at 1024x768 —
11-16 s per interactive refine call (the BASELINE config-4 floor). df32
carries ~2^-48 relative precision on the VPU's IEEE f32 elementwise units,
far below the 1e-7 target, so the whole rung stays on device.

The math mirrors solvers/matting.py `_precompute`/`_matvec` term for term
(three residual-accumulation passes, packed LDL factors, centered
covariance matvec) with DELTA = 0 — df32 needs no scale-aware ridge: the
ridge exists to cap cond(A_k) at what *f32* CG can certify; at 2^-48 the
achievable residual floor for the measured worst conditioning (~1e7) is
~4e-8 < 1e-7. Radius is fixed at 1: both reference-precision rungs use 3x3
windows (pymatting default; the retry ladder's laplacian_kwargs keep
radius=1, reference matting_refine.py:153-157).

Certification is a TRUE residual (b - A x recomputed after the recursive-
residual CG loop), not the recursive one: df32 recursive-residual drift
over ~100 iterations is ~2^-48 * cond ~ 4e-8 — same order as the target,
so the loop aims at rtol/2 and the reported residual is exact-by-
construction. If the true residual misses, one warm continuation loop runs
before giving up (both loops live in ONE jitted program: one dispatch
through the tunnel per solve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from image_segmenter_tpu.ops import df32 as D
from image_segmenter_tpu.ops.df32 import DF
from image_segmenter_tpu.solvers.matting import (_LAMBDA, _pad_r, _precompute,
                                                 _shifts, _sl)

_R = 1  # fixed: reference-precision rungs are radius-1 (3x3 windows)


def _split_f64(x64) -> DF:
    """Exact DF representation of a host f64 array (hi = f32 round, lo =
    f32 of the remainder; exact because the remainder fits one f32)."""
    import numpy as np

    hi = np.asarray(x64, np.float32)
    lo = np.asarray(np.asarray(x64, np.float64) - hi.astype(np.float64),
                    np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def _pad_dd(x: DF, r: int) -> DF:
    return DF(_pad_r(x.hi, r), _pad_r(x.lo, r))


def _sl_dd(xp: DF, r: int, dy: int, dx: int, h: int, w: int) -> DF:
    return DF(_sl(xp.hi, r, dy, dx, h, w), _sl(xp.lo, r, dy, dx, h, w))


def _box_dd(xp: DF, r: int, h: int, w: int) -> DF:
    """(2r+1)^2 box sum of a zero-padded DF array, separably, with df32
    adds throughout (summing hi/lo planes independently would round away
    the compensation)."""
    cols = None
    for dx in range(-r, r + 1):
        t = DF(xp.hi[:, r + dx: r + dx + w], xp.lo[:, r + dx: r + dx + w])
        cols = t if cols is None else D.add(cols, t)
    out = None
    for dy in range(-r, r + 1):
        t = DF(cols.hi[r + dy: r + dy + h], cols.lo[r + dy: r + dy + h])
        out = t if out is None else D.add(out, t)
    return out


class _PreDD:
    """df32 precompute: exact-eps LDL factors + means (mirrors _Precomp)."""

    def __init__(self, img: DF, img_pad: DF, n_k, rnk: DF, cnt, mu: DF,
                 fact, diag_f32):
        self.img = img            # (H, W, 3) DF
        self.img_pad = img_pad    # (H+2, W+2, 3) DF
        self.n_k = n_k            # (H, W) f32 (exact small ints)
        self.rnk = rnk            # (H, W) DF: 1/n_k
        self.cnt = cnt            # (H, W) f32
        self.mu = mu              # (H, W, 3) DF
        self.fact = fact          # 6-tuple of (H, W) DF: i1 i2 i3 l21 l31 l32
        self.diag_f32 = diag_f32  # (H, W) f32: Jacobi preconditioner only


def _precompute_dd(img: DF, eps: DF) -> _PreDD:
    h, w = img.hi.shape[:2]
    r = _R
    sh = _shifts(r)
    ones = jnp.ones((h, w), jnp.float32)
    v_pad = _pad_r(ones, r)
    img_pad = _pad_dd(img, r)

    # window sizes / coverage counts: exact small integers in f32
    n_k = sum(_sl(v_pad, r, dy, dx, h, w) for dy, dx in sh)
    cnt = n_k  # symmetric for the centered box
    rnk = D.div(D.df(ones), D.df(n_k))
    mu = D.mul(_box_dd(img_pad, r, h, w), DF(rnk.hi[..., None],
                                             rnk.lo[..., None]))

    def _d(dy, dx):
        """Centered member offset (I_j - mu_k), masked to in-bounds."""
        v = _sl(v_pad, r, dy, dx, h, w)
        d = D.sub(_sl_dd(img_pad, r, dy, dx, h, w), mu)
        return D.mul_f(d, v[..., None])

    def _ch(x: DF, c: int) -> DF:
        return DF(x.hi[..., c], x.lo[..., c])

    zero = D.df(jnp.zeros((h, w), jnp.float32))
    # pass A: first-channel moments
    a00 = a01 = a02 = zero
    for dy, dx in sh:
        d = _d(dy, dx)
        d0, d1, d2 = _ch(d, 0), _ch(d, 1), _ch(d, 2)
        a00 = D.add(a00, D.mul(d0, d0))
        a01 = D.add(a01, D.mul(d0, d1))
        a02 = D.add(a02, D.mul(d0, d2))
    p1 = D.add(a00, eps)
    l21 = D.div(a01, p1)
    l31 = D.div(a02, p1)

    # pass B: residuals of ch2/ch3 on ch1
    q22 = q23 = zero
    for dy, dx in sh:
        d = _d(dy, dx)
        d0, d1, d2 = _ch(d, 0), _ch(d, 1), _ch(d, 2)
        r2 = D.sub(d1, D.mul(l21, d0))
        r3 = D.sub(d2, D.mul(l31, d0))
        q22 = D.add(q22, D.mul(r2, r2))
        q23 = D.add(q23, D.mul(r2, r3))
    one = D.df(ones)
    p2 = D.add(q22, D.mul(eps, D.add(one, D.mul(l21, l21))))
    l32 = D.div(D.add(q23, D.mul(eps, D.mul(l21, l31))), p2)

    # pass C: residual of ch3 on (ch1, ch2)
    q3 = zero
    for dy, dx in sh:
        d = _d(dy, dx)
        d0, d1, d2 = _ch(d, 0), _ch(d, 1), _ch(d, 2)
        rr = D.sub(D.sub(d2, D.mul(l31, d0)),
                   D.mul(l32, D.sub(d1, D.mul(l21, d0))))
        q3 = D.add(q3, D.mul(rr, rr))
    bq = D.sub(D.mul(l21, l32), l31)
    p3 = D.add(q3, D.mul(eps, D.add(D.add(D.mul(bq, bq), D.mul(l32, l32)),
                                    one)))

    nk_dd = D.df(n_k)
    i1 = D.div(nk_dd, p1)
    i2 = D.div(nk_dd, p2)
    i3 = D.div(nk_dd, p3)

    # Jacobi preconditioner from the tested f32 precompute (ridge DELTA=1e-5
    # — a preconditioner only has to be SPD and fixed, not exact)
    pre32 = _precompute(img.hi, 1e-7, r)
    return _PreDD(img, img_pad, n_k, rnk, cnt, mu,
                  (i1, i2, i3, l21, l31, l32), pre32.diag)


def _matvec3_fact_dd(f, v0: DF, v1: DF, v2: DF):
    """dinv @ v from packed df32 LDL factors (mirrors _matvec3_fact)."""
    i1, i2, i3, l21, l31, l32 = f
    bq = D.sub(D.mul(l21, l32), l31)
    t1 = D.sub(v1, D.mul(l21, v0))
    t2 = D.add(D.sub(D.mul(bq, v0), D.mul(l32, v1)), v2)
    w0 = D.mul(i1, v0)
    w1 = D.mul(i2, t1)
    w2 = D.mul(i3, t2)
    return (D.add(D.sub(w0, D.mul(l21, w1)), D.mul(bq, w2)),
            D.sub(w1, D.mul(l32, w2)),
            w2)


def _matvec_dd(pre: _PreDD, p: DF) -> DF:
    """L @ p with the exact-eps operator (mirrors _matvec, radius 1)."""
    h, w = p.hi.shape
    r = _R
    sh = _shifts(r)
    p_pad = _pad_dd(p, r)

    pbar = D.mul(_box_dd(p_pad, r, h, w), pre.rnk)
    mu0 = DF(pre.mu.hi[..., 0], pre.mu.lo[..., 0])
    mu1 = DF(pre.mu.hi[..., 1], pre.mu.lo[..., 1])
    mu2 = DF(pre.mu.hi[..., 2], pre.mu.lo[..., 2])
    zero = D.df(jnp.zeros((h, w), jnp.float32))
    c0 = c1 = c2 = zero
    for dy, dx in sh:
        vp = _sl_dd(p_pad, r, dy, dx, h, w)
        i_sh = _sl_dd(pre.img_pad, r, dy, dx, h, w)
        # out-of-bounds p_pad reads are exact zeros, which zero the term
        c0 = D.add(c0, D.mul(D.sub(DF(i_sh.hi[..., 0], i_sh.lo[..., 0]),
                                   mu0), vp))
        c1 = D.add(c1, D.mul(D.sub(DF(i_sh.hi[..., 1], i_sh.lo[..., 1]),
                                   mu1), vp))
        c2 = D.add(c2, D.mul(D.sub(DF(i_sh.hi[..., 2], i_sh.lo[..., 2]),
                                   mu2), vp))
    a0, a1, a2 = _matvec3_fact_dd(pre.fact, D.mul(c0, pre.rnk),
                                  D.mul(c1, pre.rnk), D.mul(c2, pre.rnk))
    b = D.sub(pbar, D.add(D.add(D.mul(a0, mu0), D.mul(a1, mu1)),
                          D.mul(a2, mu2)))

    def _boxp(x: DF) -> DF:
        return _box_dd(_pad_dd(x, r), r, h, w)

    bs0, bs1, bs2, bs_b = _boxp(a0), _boxp(a1), _boxp(a2), _boxp(b)
    i0 = DF(pre.img.hi[..., 0], pre.img.lo[..., 0])
    i1 = DF(pre.img.hi[..., 1], pre.img.lo[..., 1])
    i2 = DF(pre.img.hi[..., 2], pre.img.lo[..., 2])
    s = D.add(D.add(D.mul(bs0, i0), D.mul(bs1, i1)),
              D.add(D.mul(bs2, i2), bs_b))
    return D.sub(D.mul_f(p, pre.cnt), s)


def _cg_dd(amv, b: DF, m_inv, x0: DF, rtol: float, max_iter: int):
    """Jacobi-PCG on recursive residuals, aiming at rtol/2; returns
    (x, it). Plain textbook PCG: this solver is never vmapped over a batch
    with data-dependent branches, and df32's 2^-48 precision keeps the
    curvature breakdown that plagues the f32 path ~24 bits further away."""
    bnorm2 = D.to_f32(D.dot(b, b)) + 1e-30
    target2 = (0.5 * rtol) ** 2 * bnorm2

    r0 = D.sub(b, amv(x0))
    z0 = D.mul_f(r0, m_inv)
    rz0 = D.dot(r0, z0)

    def cond(st):
        _, r, _, _, it = st
        res2 = D.to_f32(D.dot(r, r))
        return (res2 > target2) & (it < max_iter) & jnp.isfinite(res2)

    def body(st):
        x, r, p, rz, it = st
        y = amv(p)
        pap = D.to_f32(D.dot(p, y))
        step = D.to_f32(rz) / jnp.where(pap > 0, pap, 1.0)
        ok = pap > 0
        x = D.select(ok, D.add(x, D.mul_f(p, step)), x)
        r = D.select(ok, D.sub(r, D.mul_f(y, step)), r)
        z = D.mul_f(r, m_inv)
        rz2 = D.dot(r, z)
        beta = D.to_f32(rz2) / jnp.maximum(D.to_f32(rz), 1e-30)
        p = D.select(ok, D.add(z, D.mul_f(p, beta)), p)
        it = it + 1
        # a non-positive curvature in df32 means the system is beyond even
        # compensated precision — bail via the iteration cap
        it = jnp.where(ok, it, max_iter)
        return x, r, p, D.select(ok, rz2, rz), it

    x, _, _, _, it = lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    return x, it


def _solve_dd_core(img: DF, eps: DF, trimap, x0,
                   rtol: float, max_iter: int):
    pre = _precompute_dd(img, eps)

    is_known = ((trimap < 0.1) | (trimap > 0.9)).astype(jnp.float32)
    known_fg = (trimap > 0.9).astype(jnp.float32)
    lam_known = _LAMBDA * is_known

    def amv(p: DF) -> DF:
        return D.add(_matvec_dd(pre, p), D.mul_f(p, lam_known))

    b = D.df(_LAMBDA * known_fg)
    m_inv = 1.0 / jnp.maximum(pre.diag_f32 + lam_known, 1e-6)

    # non-finite warm starts (a broken-down f32 attempt) fall back to the
    # trimap per-pixel; clip survives neither inf nor nan
    x0 = jnp.where(jnp.isfinite(x0), jnp.clip(x0, 0.0, 1.0),
                   trimap.astype(jnp.float32))
    x0 = jnp.where(is_known > 0, trimap.astype(jnp.float32), x0)
    x = D.df(x0)

    bnorm = jnp.sqrt(D.to_f32(D.dot(b, b))) + 1e-30
    x, it1 = _cg_dd(amv, b, m_inv, x, rtol, max_iter)
    # TRUE residual certification + one warm continuation if drift ate the
    # margin (both loops in this one program: one dispatch per solve)
    r_true = D.sub(b, amv(x))
    res1 = jnp.sqrt(D.to_f32(D.dot(r_true, r_true))) / bnorm
    budget = jnp.maximum(max_iter - it1, 0)

    def _continue(args):
        x, budget = args
        return _cg_dd(amv, b, m_inv, x, rtol, jnp.int32(budget))

    # scalar cond in an un-vmapped program: the continuation only runs when
    # the first loop's true residual missed the contract
    x, it2 = lax.cond(res1 > rtol, _continue,
                      lambda a: (a[0], jnp.int32(0)), (x, budget))
    r_true = D.sub(b, amv(x))
    res = jnp.sqrt(D.to_f32(D.dot(r_true, r_true))) / bnorm
    alpha = jnp.clip(D.to_f32(x), 0.0, 1.0)
    return alpha, res <= rtol, it1 + it2, res


@functools.partial(jax.jit, static_argnames=("rtol", "max_iter"))
def _solve_dd_jit(img_hi, img_lo, eps_hi, eps_lo, trimap, x0,
                  rtol: float, max_iter: int):
    return _solve_dd_core(DF(img_hi, img_lo), DF(eps_hi, eps_lo),
                          trimap, x0, rtol, max_iter)


@functools.partial(jax.jit, static_argnames=("rtol", "max_iter"))
def _solve_dd_jit_u8(img_u8, tab_hi, tab_lo, eps_hi, eps_lo, tri_code, x0,
                     rtol: float, max_iter: int):
    """u8-ingest entry: the image planes arrive as raw u8 plus a 256-entry
    host-split hi/lo table and are gathered ON DEVICE — bit-identical DF
    values to the f64-split path at ~1/8 the host->device bytes (the
    tunnel's H2D rate, not compute, floors the interactive rung's latency;
    BENCH_NOTES round-4). The trimap arrives as codes {0,1,2} -> {0,.5,1}."""
    idx = img_u8.astype(jnp.int32)
    img = DF(jnp.take(tab_hi, idx), jnp.take(tab_lo, idx))
    tri = jnp.take(jnp.asarray([0.0, 0.5, 1.0], jnp.float32),
                   tri_code.astype(jnp.int32))
    return _solve_dd_core(img, DF(eps_hi, eps_lo), tri, x0, rtol, max_iter)


_U8_TABLES: tuple | None = None


def _u8_tables() -> tuple:
    """(tab_hi, tab_lo): exact DF split of n/255 for n in 0..255."""
    global _U8_TABLES
    if _U8_TABLES is None:
        import numpy as np

        t = _split_f64(np.arange(256, dtype=np.float64) / 255.0)
        _U8_TABLES = (t.hi, t.lo)
    return _U8_TABLES


def _as_u8_exact(image01):
    """The u8 array `u` with image01 == u/255 exactly (f64), else None."""
    import numpy as np

    x = np.asarray(image01)
    if x.dtype == np.uint8:
        return x
    x = np.asarray(x, np.float64)
    if x.size == 0 or x.min() < 0.0 or x.max() > 1.0:
        return None
    u = np.rint(x * 255.0)
    if np.array_equal(x, u / 255.0):
        return u.astype(np.uint8)
    return None


def _tri_codes(trimap):
    """u8 codes {0,1,2} for a {0,0.5,1} trimap, else None."""
    import numpy as np

    t = np.asarray(trimap, np.float64)
    if np.all((t == 0.0) | (t == 0.5) | (t == 1.0)):
        return (t * 2.0).astype(np.uint8)
    return None


def solve_alpha_cf_dd(image01, trimap, epsilon=1e-7, rtol: float = 1e-7,
                      max_iter: int = 10000, x0=None,
                      image_u8=None, tri_code=None):
    """Reference-precision closed-form matting solve, device-resident.

    Args:
      image01: (H, W, 3) float64 ndarray in [0, 1] (host). Split exactly
        into a df32 pair so the operator matches the f64 operator built
        from the same values (u8/255 is not f32-representable; the hi/lo
        split is).
      trimap: (H, W) float {0, 0.5, 1}.
      epsilon: exact Levin regularizer (DELTA = 0 — no f32 ridge).
      x0: optional f32 warm start (the certified-f32 alpha for the polish
        rung; a pyramid solution for the full-solve rung). May be a device
        array — reused in place, no host round-trip.
      image_u8, tri_code: optional PRE-SHIPPED device arrays (u8 image,
        {0,1,2} trimap codes) from a caller that already moved them —
        skips this function's own exactness detection and transfer
        (estimate_alpha_cf ships the u8 image once for both rungs).
    Returns:
      (alpha_f32 jnp (H, W), converged bool, iterations, rel_residual)
      with the residual a TRUE recomputed residual.
    """
    import numpy as np

    eps = _split_f64(np.float64(epsilon))
    if image_u8 is not None and tri_code is not None:
        if x0 is None:
            x0 = jnp.take(jnp.asarray([0.0, 0.5, 1.0], jnp.float32),
                          tri_code.astype(jnp.int32))
        tab_hi, tab_lo = _u8_tables()
        return _solve_dd_jit_u8(image_u8, tab_hi, tab_lo, eps.hi, eps.lo,
                                tri_code, jnp.asarray(x0, jnp.float32),
                                float(rtol), int(max_iter))
    u8 = _as_u8_exact(image01)
    codes = _tri_codes(trimap) if u8 is not None else None
    if codes is not None:
        # u8 ingest: ~6 MB host->device per 1024x768 call instead of ~25
        # (two f32 image planes + f32 trimap); the DF image values are
        # bit-identical via the 256-entry split table.
        if x0 is None:
            x0 = np.asarray(trimap, np.float32)
        tab_hi, tab_lo = _u8_tables()
        alpha, ok, it, res = _solve_dd_jit_u8(
            jnp.asarray(u8), tab_hi, tab_lo, eps.hi, eps.lo,
            jnp.asarray(codes), jnp.asarray(x0, jnp.float32),
            float(rtol), int(max_iter))
        return alpha, ok, it, res

    img = _split_f64(np.asarray(image01, np.float64))
    tri = jnp.asarray(np.asarray(trimap, np.float32))
    if x0 is None:
        x0 = tri
    x0 = jnp.asarray(x0, jnp.float32)
    alpha, ok, it, res = _solve_dd_jit(img.hi, img.lo, eps.hi, eps.lo,
                                       tri, x0, float(rtol), int(max_iter))
    return alpha, ok, it, res
