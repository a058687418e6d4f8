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

from image_segmenter_tpu.utils.backend import targets_tpu as _targets_tpu

_LAMBDA = 100.0  # pymatting's known-constraint weight


class _Precomp(NamedTuple):
    image: jnp.ndarray      # (H, W, 3) f32
    image_pad: jnp.ndarray  # (H+2r, W+2r, 3) f32, zero-padded once — the CG
                            # loop's matvec reads it every iteration; padding
                            # inside the loop body cost ~0.9 ms/iter at 4K b=4
    valid_n: jnp.ndarray    # (H, W) window size per center (border-clipped)
    cnt: jnp.ndarray        # (H, W) number of windows covering each pixel
    mu: jnp.ndarray         # (H, W, 3) window means
    dinv: jnp.ndarray       # (H, W, 3, 3) (Sigma + eps/n I)^-1
    diag: jnp.ndarray       # (H, W) diag(L)
    rankdef: jnp.ndarray    # (H, W) bool: window exactly rank-deficient
    planes: jnp.ndarray | None = None  # (12, H, W) native plane-major
                            # Pallas precompute output when that path ran;
                            # the fused matvec assembles its operand stack
                            # from it directly so the channel-last mu/dinv
                            # views above DCE away (bench/hlo_copies.py:
                            # their relayout cost 4x127 MB of copies at 4K)


def _shifts(radius: int):
    return [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]


def _pad_r(x: jnp.ndarray, r: int, fill=0.0) -> jnp.ndarray:
    """Pad H/W by r on all sides once; shifted reads become static slices."""
    pad = ((r, r), (r, r)) + (((0, 0),) if x.ndim == 3 else ())
    return jnp.pad(x, pad, constant_values=fill)


def _sl(xp: jnp.ndarray, r: int, dy: int, dx: int, h: int, w: int) -> jnp.ndarray:
    """Static-slice view of a padded array: out[p] = x[p + (dy,dx)]."""
    return xp[r + dy : r + dy + h, r + dx : r + dx + w]


def _box(xp: jnp.ndarray, r: int, h: int, w: int) -> jnp.ndarray:
    """(2r+1)^2 box sum of a zero-padded array, separably: rows then cols —
    2(2r+1) adds per pixel instead of (2r+1)^2."""
    cols = sum(xp[:, r + dx : r + dx + w] for dx in range(-r, r + 1))
    return sum(cols[r + dy : r + dy + h] for dy in range(-r, r + 1))


def _quad3(d, dinv):
    """d' dinv d for (..., 3) vectors against (..., 3, 3) matrices, unrolled
    to VPU elementwise ops (TPU f32 contractions synthesize from bf16 and
    here dinv spans ~9 decades — exact f32 products matter)."""
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    return (dinv[..., 0, 0] * d0 * d0 + dinv[..., 1, 1] * d1 * d1
            + dinv[..., 2, 2] * d2 * d2
            + 2.0 * (dinv[..., 0, 1] * d0 * d1 + dinv[..., 0, 2] * d0 * d2
                     + dinv[..., 1, 2] * d1 * d2))


def _matvec3_fact(f, v):
    """dinv @ v from packed LDL factors f = (..., 6) [i1, i2, i3, l21, l31,
    l32]: dinv = Linv' diag(i) Linv with Linv rows (1,0,0), (-l21,1,0),
    (bq,-l32,1), bq = l21*l32 - l31. PSD for any factor values with
    positive i."""
    i1, i2, i3 = [f[..., k].astype(jnp.float32) for k in range(3)]
    l21, l31, l32 = [f[..., k].astype(jnp.float32) for k in range(3, 6)]
    bq = l21 * l32 - l31
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    t0 = v0
    t1 = v1 - l21 * v0
    t2 = bq * v0 - l32 * v1 + v2
    w0 = i1 * t0
    w1 = i2 * t1
    w2 = i3 * t2
    return jnp.stack([
        w0 - l21 * w1 + bq * w2,
        w1 - l32 * w2,
        w2,
    ], axis=-1)


def _matvec3(dinv, v):
    """dinv @ v, unrolled (see _quad3)."""
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        dinv[..., 0, 0] * v0 + dinv[..., 0, 1] * v1 + dinv[..., 0, 2] * v2,
        dinv[..., 0, 1] * v0 + dinv[..., 1, 1] * v1 + dinv[..., 1, 2] * v2,
        dinv[..., 0, 2] * v0 + dinv[..., 1, 2] * v1 + dinv[..., 2, 2] * v2,
    ], axis=-1)


def _precompute(image: jnp.ndarray, epsilon, radius: int,
                half_stats: bool = False) -> _Precomp:
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
    dt = jnp.float64 if image.dtype == jnp.float64 else jnp.float32
    img = image.astype(dt)
    h, w = img.shape[:2]

    if (half_stats and radius == 1 and dt == jnp.float32
            and _targets_tpu(img) and min(h, w) >= 8):
        # Fused one-pass Pallas precompute: all window passes run on the
        # VMEM-resident row tile instead of re-reading HBM once per shift
        # per pass. Matches this function's XLA formulation to f32
        # rounding (kernels/pallas_precompute.py); measured 21.6 -> 5.2 ms
        # at 576x1024 b=4 on v5e.
        from image_segmenter_tpu.kernels.pallas_precompute import (
            precompute_planes)

        planes = precompute_planes(img, epsilon)
        dinv6 = jnp.moveaxis(planes[0:6], 0, -1)
        mu3 = jnp.moveaxis(planes[8:11], 0, -1)
        return _Precomp(img, _pad_r(img, radius), planes[7], planes[7],
                        mu3, dinv6, planes[6], planes[11] > 0.5, planes)

    ones = jnp.ones((h, w), dt)
    sh = _shifts(radius)
    r = radius
    eps = jnp.asarray(epsilon, dt)

    # Pad once; every shifted read below is a static slice of the padded
    # buffer (identical values to a per-shift pad+slice, but XLA fuses the
    # slices into the accumulation loops instead of materializing ~40
    # intermediate padded arrays — measured 12.9 -> ~7 ms for the whole
    # precompute at 576x1024 b=4).
    v_pad = _pad_r(ones, r)
    img_pad = _pad_r(img, r)

    n_k = _box(v_pad, r, h, w)
    mu = _box(img_pad, r, h, w) / n_k[..., None]

    # pass A: first-channel moments -> l21, l31 (+ the full covariance trace
    # for the scale-aware ridge below)
    a00 = jnp.zeros((h, w), dt)
    a01 = jnp.zeros((h, w), dt)
    a02 = jnp.zeros((h, w), dt)
    a11 = jnp.zeros((h, w), dt)
    a22 = jnp.zeros((h, w), dt)
    for dy, dx in sh:
        v = _sl(v_pad, r, dy, dx, h, w)  # in-bounds indicator
        d = (_sl(img_pad, r, dy, dx, h, w) - mu) * v[..., None]
        a00 += d[..., 0] * d[..., 0]
        a01 += d[..., 0] * d[..., 1]
        a02 += d[..., 0] * d[..., 2]
        a11 += d[..., 1] * d[..., 1]
        a22 += d[..., 2] * d[..., 2]
    # Scale-aware ridge: eps_w = max(eps, DELTA * tr(Z'Z)) per window, so
    # cond(A_k) <= ~3/DELTA. This is the SAFE conditioning control: the
    # factored matrix stays EXACTLY Z'Z + eps_w*I >= Z'Z, which is the
    # algebraic condition for every window term I - W_k of the Laplacian to
    # remain PSD (Z is centered, so Z'1 = 0 splits W_k's spectrum). An
    # earlier revision floored the LOWER LDL pivots instead; because l32 is
    # computed from the floored pivot, that perturbs off-diagonal structure
    # and loses the >= Z'Z ordering — the operator could go indefinite and
    # CG then diverged even in f64 on quantized-flat images. The ridge
    # deviates from the exact eps=1e-7 operator only in windows whose
    # smallest color-spread direction is > ~1/DELTA weaker than the trace,
    # where the weak-direction affinity weight is visually irrelevant:
    # corpus IoU vs the f64 exact-eps oracle stays >= 0.99 on every photo.
    # f64 needs no conditioning help and exists to BE the reference
    # operator, so its ridge is exactly eps (DELTA = 0).
    _DELTA = jnp.asarray(1e-5 if dt == jnp.float32 else 0.0, dt)
    eps_w = jnp.maximum(eps, _DELTA * (a00 + a11 + a22))
    p1 = a00 + eps_w
    l21 = a01 / p1
    l31 = a02 / p1

    # pass B: residuals of ch2/ch3 on ch1 -> p2, l32
    q22 = jnp.zeros((h, w), dt)
    q23 = jnp.zeros((h, w), dt)
    for dy, dx in sh:
        v = _sl(v_pad, r, dy, dx, h, w)
        d = (_sl(img_pad, r, dy, dx, h, w) - mu) * v[..., None]
        r2 = d[..., 1] - l21 * d[..., 0]
        r3 = d[..., 2] - l31 * d[..., 0]
        q22 += v * r2 * r2
        q23 += v * r2 * r3
    p2 = q22 + eps_w * (1.0 + l21 * l21)
    l32 = (q23 + eps_w * l21 * l31) / p2

    # pass C: residual of ch3 on (ch1, ch2) -> p3
    q3 = jnp.zeros((h, w), dt)
    for dy, dx in sh:
        v = _sl(v_pad, r, dy, dx, h, w)
        d = (_sl(img_pad, r, dy, dx, h, w) - mu) * v[..., None]
        rr = (d[..., 2] - l31 * d[..., 0]) - l32 * (d[..., 1] - l21 * d[..., 0])
        q3 += v * rr * rr
    bq = l21 * l32 - l31
    p3 = q3 + eps_w * (bq * bq + l32 * l32 + 1.0)

    # Per-window EXACT rank deficiency flag (pre-ridge smallest pivot ~ 0
    # with non-trivial spread): true on quantized-color boundaries, false on
    # photographic edges whose sensor noise keeps q3 ~ n*sigma^2 > 0. Used
    # by estimate_alpha_cf to route hopelessly-conditioned systems straight
    # to the f64 reference-precision solve (see rank_deficient_fraction).
    tr = a00 + a11 + a22
    rankdef = (q3 < jnp.asarray(1e-5, dt) * tr) & (tr > 1e-4)

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
    #
    # Reindexed by the WINDOW k instead of the member i: for each shift s,
    # g_s(k) = (1 + (I_{k-s}-mu_k)' Dk^-1 (I_{k-s}-mu_k))/n_k reads mu/dinv/
    # n_k UNSHIFTED (only the image is a padded slice), and the member's
    # term is a shifted read of the scalar plane g_s. Same per-term floats
    # in the same shift order — bitwise identical to the member-indexed
    # loop — but the only padded operands are the image (already padded)
    # and a scalar plane, instead of padding/shift-reading the 9-plane
    # inverse stack (the single most expensive fusion of the precompute,
    # 2.2 ms at 4K b=4). Entries of g_s at windows whose member k-s is out
    # of bounds are garbage but provably never read: the member slice only
    # touches k = i + s for in-bounds i, and zero padding of g_s supplies
    # the out-of-bounds-window zeros the validity mask used to.
    diag_sum = jnp.zeros((h, w), dt)
    nk_safe = jnp.maximum(n_k, 1.0)
    for dy, dx in sh:
        d = _sl(img_pad, r, -dy, -dx, h, w) - mu
        g = (1.0 + _quad3(d, dinv)) / nk_safe
        diag_sum += _sl(_pad_r(g, r), r, dy, dx, h, w)
    diag = cnt - diag_sum
    if half_stats:
        # Compressed operator storage for the CG hot loop: the (3,3) window
        # inverse (36 B/px, re-read every CG iteration) is replaced by its
        # six LDL factors [1/p1, 1/p2, 1/p3, l21, l31, l32] (24 B/px f32);
        # the matvec reconstructs dinv = Linv' D^-1 Linv on the fly —
        # bitwise-equivalent math, one third less traffic on the dominant
        # operand. bf16 factors were tried and REJECTED: PSD survives
        # factor rounding by construction, but the ~0.4% relative operator
        # perturbation blows up through near-rank-deficient windows on
        # flat-ish images (corpus sky textures dropped to IoU 0.93 vs the
        # f64 oracle, and quantized images stopped converging at all).
        dinv = jnp.stack([i1, i2, i3, l21, l31, l32], axis=-1)
    return _Precomp(img, img_pad, n_k, cnt, mu, dinv, diag, rankdef)


def _matvec(pre: _Precomp, p: jnp.ndarray, radius: int) -> jnp.ndarray:
    img, n_k, cnt, mu, dinv = pre.image, pre.valid_n, pre.cnt, pre.mu, pre.dinv
    h, w = p.shape
    r = radius
    sh = _shifts(radius)

    # p changes every iteration so its pad is paid per-call; the image pad
    # is loop-invariant and comes precomputed (pre.image_pad)
    p_pad = _pad_r(p, r)
    img_pad = pre.image_pad

    psum = _box(p_pad, r, h, w)  # separable: zero padding makes box == sum_j
    pbar = psum / n_k
    # centered covariance sum: sum_j (I_j - mu_k) p_j  (exact in f32; the
    # textbook box(I*p) - mu*box(p) form cancels catastrophically vs eps).
    # No validity mask needed: out-of-bounds reads of p_pad are 0, which
    # zeroes the whole term (img_pad reads don't matter there).
    cov = jnp.zeros((h, w, 3), jnp.float32)
    for dy, dx in sh:
        vp = _sl(p_pad, r, dy, dx, h, w)
        cov += (_sl(img_pad, r, dy, dx, h, w) - mu) * vp[..., None]
    if dinv.ndim == 3 and dinv.shape[-1] == 6:  # packed LDL factors
        a = _matvec3_fact(dinv, cov / n_k[..., None])
    else:
        a = _matvec3(dinv, cov / n_k[..., None])
    b = pbar - jnp.sum(a * mu, axis=-1)

    bs_a = _box(_pad_r(a, r), r, h, w)
    bs_b = _box(_pad_r(b, r), r, h, w)
    return cnt * p - (jnp.sum(bs_a * img, axis=-1) + bs_b)


def _solve_impl(
    image01: jnp.ndarray,
    trimap: jnp.ndarray,
    epsilon,
    radius: int,
    lam,
    rtol: float,
    max_iter: int,
    x0: jnp.ndarray | None,
    half_stats: bool,
):
    """Shared CG body; returns (alpha, ok, it, res, rankdef_frac) where
    rankdef_frac is the unknown-band exact-rank-deficiency fraction from
    the SAME precompute the solve uses (see rank_deficient_fraction) — the
    f64-routing signal at zero extra passes."""
    dt = jnp.float64 if image01.dtype == jnp.float64 else jnp.float32
    pre = _precompute(image01, epsilon, radius, half_stats=half_stats)
    is_known = ((trimap < 0.1) | (trimap > 0.9)).astype(dt)
    known_fg = (trimap > 0.9).astype(dt)

    # The overlap-tiled operand stack costs ~65 B/pixel of extra HBM
    # (13 planes x (T+8)/T at T=32); cap the fused path so full-res
    # solves (sharded/4K) can't quadruple their footprint under vmap.
    use_fused_mv = (dt == jnp.float32 and radius == 1
                    and pre.dinv.ndim == 3 and pre.dinv.shape[-1] == 6
                    and _targets_tpu(image01)
                    and min(image01.shape[:2]) >= 8
                    and image01.shape[0] * image01.shape[1] <= 2_500_000)
    if use_fused_mv:
        # Fused one-pass Pallas matvec: the whole L@p (covariance, LDL
        # solve, member boxes) runs on the VMEM-resident row tile instead
        # of ~5 XLA fusions re-reading HBM (kernels/pallas_matvec.py;
        # matches _matvec bit-exactly — same accumulation orders,
        # different fusion; measured 0.92 vs 1.47 ms/matvec XLA at
        # 576x1024 b=4 on v5e). The operand stack is assembled and
        # overlap-tiled ONCE here, outside the while_loop (XLA does not
        # hoist the pad/stack).
        from image_segmenter_tpu.kernels.pallas_matvec import (
            build_matvec_stack, build_matvec_stack_planes,
            matvec_planes_tiled, tile_stack)

        if pre.planes is not None:
            # Plane-major assembly straight from the Pallas precompute
            # output — same floats, no channel-last round trip (see
            # build_matvec_stack_planes for the HLO copy audit).
            stack = build_matvec_stack_planes(pre.image, pre.planes)
        else:
            stack = build_matvec_stack(
                pre.image, pre.valid_n, pre.mu, pre.dinv)
        mv_tiles = tile_stack(stack)

        def amv(p):
            return matvec_planes_tiled(mv_tiles, p) + lam * is_known * p
    else:
        def amv(p):
            return _matvec(pre, p, radius) + lam * is_known * p

    b = lam * known_fg
    # diag(L) is mathematically > 0; f32 can round tiny entries negative,
    # which would flip the Jacobi preconditioner's sign — clamp.
    m_inv = 1.0 / jnp.maximum(pre.diag + lam * is_known, 1e-6)

    if x0 is None:
        x0 = trimap.astype(dt)  # warm start at the trimap
    else:
        x0 = jnp.where(is_known > 0, trimap.astype(dt),
                       jnp.clip(x0.astype(dt), 0.0, 1.0))
    r0 = b - amv(x0)
    z0 = m_inv * r0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    def cond(state):
        _, r, _, _, it, _ = state
        res = jnp.sqrt(jnp.sum(r * r)) / bnorm
        # a non-finite residual means the system is beyond f32 CG (flat-
        # image + eps=1e-7 conditioning): exit, report not-converged, and
        # let the compat retry ladder (eps=1e-6, then morphological refine —
        # reference matting_refine.py:144-161) take over.
        return (res > rtol) & (it < max_iter) & jnp.isfinite(res)

    def body(state):
        x, r, p, rz, it, pending = state

        # L's smooth near-null modes put p.Ap at the f32 matvec noise floor;
        # stepping along such a direction (curvature ~ rounding error of
        # |p|^2-scale sums) explodes plain CG to inf within a few iterations
        # on flat-image systems. When relative curvature is at noise level,
        # drop the direction: recompute the exact residual and restart from
        # preconditioned steepest descent. Well-conditioned systems (every
        # CNN-alpha trimap measured) never trigger this and run textbook
        # PCG; truly f32-intractable systems exit via the cond's isfinite
        # check into the compat retry ladder (reference :144-161).
        #
        # ONE matvec per iteration, branchless on purpose: the pipeline
        # vmaps this solve over the batch, and a lax.cond(broke, restart,
        # advance) under vmap executes BOTH branches — the restart's
        # amv(x) was a full second matvec every iteration whether or not
        # any lane broke. Instead, a detected breakdown defers the exact-
        # residual restart to the NEXT iteration, whose single matvec is
        # applied to x (`pending`) instead of p. Same work per restart as
        # the cond formulation (one extra iteration), none when CG runs
        # clean.
        y = amv(jnp.where(pending, x, p))

        # restart lane (pending): exact residual at unchanged x, beta = 0
        r_r = b - y

        # advance lane: textbook PCG step (garbage when pending/broke —
        # selected away; a guarded divisor keeps the unselected lane's
        # inf/nan from being computed via 0/0)
        pap = jnp.sum(p * y)
        broke = ~(pap > 1e-10 * jnp.sum(p * p))
        step = rz / jnp.where(broke, 1.0, pap)
        x_a = x + step * p
        r_a = r - step * y

        take_restart = pending
        take_advance = (~pending) & (~broke)
        x2 = jnp.where(take_advance, x_a, x)
        r2 = jnp.where(take_restart, r_r, jnp.where(take_advance, r_a, r))
        z = m_inv * r2
        rz2 = jnp.sum(r2 * z)
        # broke-detected iteration: state holds for one step (p/rz reused
        # only as dead operands); restart/advance refresh the direction
        beta = jnp.where(take_advance, rz2 / jnp.maximum(rz, 1e-30), 0.0)
        p2 = jnp.where(take_restart | take_advance, z + beta * p, p)
        rz_keep = take_restart | take_advance
        rz3 = jnp.where(rz_keep, rz2, rz)
        return x2, r2, p2, rz3, it + 1, broke & ~pending

    x, r, _, _, it, _ = lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.int32(0), jnp.bool_(False)))
    res = jnp.sqrt(jnp.sum(r * r)) / bnorm
    alpha = jnp.clip(x, 0.0, 1.0)
    unk = (trimap > 0.1) & (trimap < 0.9)
    frac = (pre.rankdef & unk).sum() / jnp.maximum(unk.sum(), 1)
    return alpha, res <= rtol, it, res, frac


@functools.partial(jax.jit, static_argnames=("radius", "max_iter", "rtol",
                                              "half_stats"))
def solve_alpha_cf(
    image01: jnp.ndarray,
    trimap: jnp.ndarray,
    epsilon=1e-7,
    radius: int = 1,
    lam=_LAMBDA,
    rtol: float = 1e-5,
    max_iter: int = 400,
    x0: jnp.ndarray | None = None,
    half_stats: bool = False,
):
    """Solve (L + lam*C) alpha = lam*known_fg, alpha clipped to [0,1].

    Args:
      image01: (H, W, 3) float in [0, 1].
      trimap: (H, W) float: 0 = BG, 1 = FG, 0.5 = unknown.
      epsilon: Levin regularizer. NOTE (f32 inputs only): the effective
        per-window ridge is `max(epsilon, 1e-5 * tr(Z'Z))` — a scale-aware
        floor that keeps the windowed systems f32-factorable (see
        _precompute). This intentionally deviates from the reference's
        exact-eps operator in very-low-spread windows; pass f64 inputs
        (the f64 rung applies DELTA = 0) to get exact-eps semantics, as
        compat's reference-precision ladder does.
      x0: optional warm start (e.g. an upsampled coarse-level solution);
        defaults to the trimap. Knowns are clamped to the trimap either way.
    Returns:
      (alpha, converged, iterations, rel_residual)
    """
    alpha, ok, it, res, _ = _solve_impl(
        image01, trimap, epsilon, radius, lam, rtol, max_iter, x0, half_stats)
    return alpha, ok, it, res


@functools.partial(jax.jit, static_argnames=("radius", "max_iter", "rtol",
                                              "half_stats"))
def solve_alpha_cf_with_conditioning(
    image01: jnp.ndarray,
    trimap: jnp.ndarray,
    epsilon=1e-7,
    radius: int = 1,
    lam=_LAMBDA,
    rtol: float = 1e-5,
    max_iter: int = 400,
    x0: jnp.ndarray | None = None,
    half_stats: bool = False,
):
    """solve_alpha_cf plus the unknown-band rank-deficiency fraction as a
    5th output — ONE compiled program, so the compat ladder's f64 routing
    costs no second precompute/compile (the standalone
    rank_deficient_fraction remains for diagnostics/tests)."""
    return _solve_impl(
        image01, trimap, epsilon, radius, lam, rtol, max_iter, x0, half_stats)


_PYRAMID_MIN_DIM = 400  # coarsest level's max dimension stays >= this / 2
_RANKDEF_ROUTE_FRAC = 0.1  # unknown-band rank-deficiency above this -> f64


@functools.partial(jax.jit, static_argnames=("radius",))
def rank_deficient_fraction(image01: jnp.ndarray, trimap: jnp.ndarray,
                            epsilon=1e-7, radius: int = 1) -> jnp.ndarray:
    """Fraction of unknown-band window centers that are EXACTLY rank
    deficient (pre-ridge smallest LDL pivot ~ 0 despite non-trivial color
    spread). Quantized/posterized images score high (color boundaries are
    noise-free rank-1 windows: 0.42 measured on the reference's working
    image); photographs score ~0 (sensor noise keeps every pivot positive:
    <= 0.018 over the whole corpus). The product path gets this fused into
    the solve (solve_alpha_cf_with_conditioning); this standalone variant
    exists for diagnostics and tests."""
    pre = _precompute(image01, epsilon, radius)
    unk = (trimap > 0.1) & (trimap < 0.9)
    return (pre.rankdef & unk).sum() / jnp.maximum(unk.sum(), 1)


@functools.partial(jax.jit, static_argnames=("nh", "nw"))
def _coarse_level(image01: jnp.ndarray, trimap: jnp.ndarray, nh: int, nw: int):
    """Half-resolution (image, trimap) for the solve pyramid.

    The coarse trimap is CONSERVATIVE: a coarse pixel is known-FG/BG only
    where the area-resampled known indicator is (numerically) all-known, so
    the coarse solve never constrains a region that is mixed at fine scale.
    """
    dt = image01.dtype
    img_s = jax.image.resize(image01, (nh, nw, 3), "linear")
    fg = jax.image.resize((trimap > 0.9).astype(dt), (nh, nw), "linear")
    bg = jax.image.resize((trimap < 0.1).astype(dt), (nh, nw), "linear")
    tri_s = jnp.where(fg > 0.999, 1.0, jnp.where(bg > 0.999, 0.0, 0.5))
    return img_s, tri_s.astype(dt)


@functools.partial(jax.jit, static_argnames=("nh", "nw"))
def _upsample_alpha(alpha: jnp.ndarray, nh: int, nw: int):
    return jax.image.resize(alpha, (nh, nw), "linear")


@jax.jit
def _expand_u8_f32(u8: jnp.ndarray, tab_hi: jnp.ndarray) -> jnp.ndarray:
    """Device-side u8 -> f32 image01 via the 256-entry fl32(n/255) table —
    bit-identical to the host `np.asarray(u8/255.0, np.float32)` plane at
    u8 bytes over the tunnel (the table's hi part IS that rounding)."""
    return jnp.take(tab_hi, u8.astype(jnp.int32))


@jax.jit
def _expand_tri_f32(codes: jnp.ndarray) -> jnp.ndarray:
    """{0,1,2} u8 trimap codes -> f32 {0, 0.5, 1} plane on device."""
    return jnp.take(jnp.asarray([0.0, 0.5, 1.0], jnp.float32),
                    codes.astype(jnp.int32))


def _solve_pyramid(img, tri, epsilon, radius, max_iter, rtol=1e-5):
    """Coarse-to-fine solve; returns the finest level's
    (alpha, ok, it, res, rankdef_frac)."""
    # Build the (host-side, static-shape) pyramid: fine -> coarse.
    levels = [(img, tri)]
    while max(levels[-1][1].shape) > _PYRAMID_MIN_DIM:
        fh, fw = levels[-1][1].shape
        nh, nw = max(fh // 2, 1), max(fw // 2, 1)
        levels.append(_coarse_level(levels[-1][0], levels[-1][1], nh, nw))

    x0 = None
    out = None
    for li, (im_l, tri_l) in enumerate(reversed(levels)):
        is_fine = li == len(levels) - 1
        if is_fine:
            # fused conditioning statistic rides along at the fine level
            out = solve_alpha_cf_with_conditioning(
                im_l, tri_l, epsilon=epsilon, radius=radius,
                max_iter=max_iter, rtol=rtol, x0=x0)
            break
        alpha, _, _, _ = solve_alpha_cf(
            im_l, tri_l, epsilon=epsilon, radius=radius, max_iter=max_iter,
            rtol=rtol, x0=x0)
        # Coarse levels are warm-start producers only; even a partially
        # converged coarse alpha beats the raw trimap as x0.
        fh, fw = levels[len(levels) - 2 - li][1].shape
        x0 = _upsample_alpha(alpha, fh, fw)
    return out


# Diagnostics of the most recent estimate_alpha_cf call (read by
# bench/corpus_iou.py to record that the polish costs << the f32 solve).
LAST_SOLVE_INFO: dict = {}


def _DD_ENABLED() -> bool:
    from image_segmenter_tpu.config import DEFAULTS

    return DEFAULTS.matting_dd


def estimate_alpha_cf(image01, trimap, laplacian_kwargs=None, cg_kwargs=None,
                      x64=False, polish=None):
    """pymatting-compatible entry point (reference matting_refine.py:147-157).

    Raises ValueError on non-convergence so the compat layer's retry/fallback
    ladder engages exactly like the reference's except paths.

    Above _PYRAMID_MIN_DIM the solve runs coarse-to-fine: each level's alpha,
    upsampled, warm-starts the next. The fine operator and convergence test
    are unchanged — the pyramid only supplies a better x0, cutting fine-level
    CG iterations on photographic inputs.

    x64=True runs the identical matrix-free solver in float64 (the
    reference's pymatting precision). Exactly-quantized flat images make the
    Laplacian's constant-per-flat-region modes so near-null that NO f32
    process can certify the 1e-5 residual (the achievable f32 residual floor
    ~ eps_f32 * cond exceeds rtol); the compat ladder uses this rung before
    falling back to morphological refine, restoring reference behavior on
    the one input class f32 cannot solve.

    polish (default True, override with False or config
    DEFAULTS.matting_f64_polish): after a CERTIFIED f32 solve, a host-f64 CG
    polish warm-started at the f32 alpha runs against the exact-eps operator
    at pymatting's rtol=1e-7. The warm start is ~the solution, so this costs
    a handful of f64 iterations — nothing like a full f64 solve — and closes
    the residual gap between the f32 operator (scale-aware ridge, rtol 1e-5)
    and the reference's (exact eps, rtol 1e-7). Measured: it moved the one
    sub-0.99 corpus photo (sky_01-up, IoU 0.98895) over the 0.99 bar.
    """
    import time as _time

    import numpy as np

    lk = dict(laplacian_kwargs or {})
    ck = dict(cg_kwargs or {})
    epsilon = float(lk.get("epsilon", 1e-7))
    radius = int(lk.get("radius", 1))
    if polish is None:
        from image_segmenter_tpu.config import DEFAULTS

        polish = DEFAULTS.matting_f64_polish
    LAST_SOLVE_INFO.clear()
    x0_dd_warm = False  # does `alpha` hold an f32 attempt usable as x0?

    # u8 ingest (BENCH_NOTES round-4): compat callers always build image01
    # as u8/255 (matting_refine.py rgb/255 ladder) and the tunnel's H2D
    # rate — not compute — floors the synchronous call, so when the input
    # is exactly u8/255 and the trimap is {0,0.5,1}, ship the raw u8 image
    # + trimap codes ONCE and expand on device via 256-entry split tables:
    # bit-identical f32/DF planes at ~1/10 the transferred bytes, reused
    # by the f32 rung and the dd polish/full rung alike.
    from image_segmenter_tpu.solvers.matting_dd import (_as_u8_exact,
                                                        _tri_codes,
                                                        _u8_tables)

    u8_dev = codes_dev = None
    u8_host = _as_u8_exact(image01)
    codes_host = _tri_codes(trimap) if u8_host is not None else None
    if codes_host is not None:
        u8_dev = jnp.asarray(u8_host)
        codes_dev = jnp.asarray(codes_host)

    t0 = _time.perf_counter()
    alpha_dev_f32 = None  # device-resident certified f32 alpha (polish x0)
    if not x64:
        # Try the f32 fast path first; its solve carries the unknown-band
        # rank-deficiency fraction as a fused output (no second precompute
        # or compiled program). Quantized-flat inputs (posterized/already-
        # simplified images) make the f32 operator materially ridge-biased
        # AND leave near-null modes unpinned at rtol=1e-5 — a certified f32
        # answer would still deviate ~0.975 IoU from pymatting — so when
        # the statistic flags them (measured margin: working image 0.42 vs
        # <= 0.018 for every corpus photo) the f32 result is DISCARDED and
        # the reference-precision path runs instead.
        max_iter = int(ck.get("maxiter", 400))
        rtol = float(ck.get("rtol", 1e-5))
        if codes_dev is not None:
            img_f32 = _expand_u8_f32(u8_dev, _u8_tables()[0])
            tri_f32 = _expand_tri_f32(codes_dev)
        else:
            img_f32 = jnp.asarray(image01, jnp.float32)
            tri_f32 = jnp.asarray(trimap, jnp.float32)
        alpha, ok, it, res, frac = _solve_pyramid(
            img_f32, tri_f32, epsilon, radius, max_iter, rtol=rtol)
        if float(frac) > _RANKDEF_ROUTE_FRAC:
            x64 = True
            x0_dd_warm = True  # the discarded f32 attempt still warm-starts
        else:
            alpha_dev_f32 = alpha
            alpha = np.asarray(alpha, dtype=np.float64)
            LAST_SOLVE_INFO.update(t_f32=_time.perf_counter() - t0,
                                   f32_iters=int(it))
            if polish and bool(ok):
                t1 = _time.perf_counter()
                use_dd = (_DD_ENABLED() and radius == 1
                          and _targets_tpu(image01))
                if use_dd:
                    # device-resident compensated-f32 polish: same exact-eps
                    # operator and TRUE-residual certification, no host-CPU
                    # CG (solvers/matting_dd.py; the host f64 path below
                    # cost 11-16 s per 1024x768 call on this 1-core host)
                    from image_segmenter_tpu.solvers.matting_dd import (
                        solve_alpha_cf_dd)

                    alpha_p, ok_p, it_p, res_p = solve_alpha_cf_dd(
                        image01, trimap,
                        epsilon=epsilon,
                        max_iter=int(ck.get("maxiter", 10000)),
                        rtol=float(ck.get("rtol", 1e-7)),
                        x0=(alpha_dev_f32 if alpha_dev_f32 is not None
                            else np.asarray(alpha, np.float32)),
                        image_u8=u8_dev, tri_code=codes_dev)
                else:
                    cpu = jax.devices("cpu")[0]
                    with jax.enable_x64(), jax.default_device(cpu):
                        alpha_p, ok_p, it_p, res_p = solve_alpha_cf(
                            jnp.asarray(image01, jnp.float64),
                            jnp.asarray(trimap, jnp.float64),
                            epsilon=epsilon, radius=radius,
                            max_iter=int(ck.get("maxiter", 10000)),
                            rtol=float(ck.get("rtol", 1e-7)),
                            x0=jnp.asarray(alpha, jnp.float64))
                ok_p = bool(ok_p)  # block before reading the timer
                LAST_SOLVE_INFO.update(t_polish=_time.perf_counter() - t1,
                                       polish_iters=int(it_p),
                                       polish_converged=ok_p,
                                       polish_backend="dd" if use_dd
                                       else "host_f64")
                if bool(ok_p):
                    # CG monotonically reduces the A-norm error, but only a
                    # certified polish replaces a certified f32 answer.
                    alpha = np.asarray(alpha_p, dtype=np.float64)

    if x64:
        # pymatting's own CG defaults (rtol=1e-7, maxiter=10000): on
        # near-singular systems a 1e-5 residual does not pin down the
        # near-null alpha modes (measured: IoU 0.978 vs the direct-solve
        # oracle at rtol=1e-5, 0.9987 at 1e-7), so the reference-precision
        # rung must also use the reference's tolerance.
        max_iter = int(ck.get("maxiter", 10000))
        rtol = float(ck.get("rtol", 1e-7))

        ok = False
        if _DD_ENABLED() and radius == 1 and _targets_tpu(image01):
            # device-resident compensated-f32 rung: exact-eps operator,
            # TRUE-residual certification at the reference tolerance. The
            # rankdef-routed f32 alpha (when one exists) warm-starts it —
            # ridge-biased but far closer than the trimap; non-finite
            # entries fall back per-pixel inside the solver.
            from image_segmenter_tpu.solvers.matting_dd import (
                solve_alpha_cf_dd)

            t_dd = _time.perf_counter()
            alpha_dd, ok, it, res = solve_alpha_cf_dd(
                image01, trimap, epsilon=epsilon,
                max_iter=max_iter, rtol=rtol,
                # the rankdef-routed f32 attempt is still device-resident
                x0=(jnp.asarray(alpha, jnp.float32)
                    if x0_dd_warm else None),
                image_u8=u8_dev, tri_code=codes_dev)
            ok = bool(ok)
            LAST_SOLVE_INFO.update(t_dd_rung=_time.perf_counter() - t_dd,
                                   dd_rung_iters=int(it),
                                   dd_rung_converged=ok)
            if ok:
                alpha = np.asarray(alpha_dd, dtype=np.float64)

        if not ok:
            # f64 on the host CPU backend: the TPU executes f64 only via
            # (glacially slow) emulation. Reached when df32 is disabled, the
            # computation targets CPU, or (cond beyond ~2^48) the dd rung
            # could not certify — f64's extra 4 bits are the last resort
            # before the compat ladder's morphological fallback.
            cpu = jax.devices("cpu")[0]
            with jax.enable_x64(), jax.default_device(cpu):
                alpha, ok, it, res, _ = _solve_pyramid(
                    jnp.asarray(image01, jnp.float64),
                    jnp.asarray(trimap, jnp.float64), epsilon, radius,
                    max_iter, rtol=rtol)
                alpha = np.asarray(alpha, dtype=np.float64)

    if not bool(ok):
        raise ValueError(
            f"closed-form matting CG did not converge: rel_residual={float(res):.3e} "
            f"after {int(it)} iterations")
    return alpha
