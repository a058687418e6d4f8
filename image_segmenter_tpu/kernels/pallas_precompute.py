"""Pallas TPU kernel: the matting-Laplacian PRECOMPUTE in one pass.

solvers/matting._precompute builds the per-window LDL factors, diag(L),
and window means with ~4 unrolled 9-shift passes over HBM-resident
operands; XLA cannot block them, so the image and intermediate planes are
re-read from HBM once per shift per pass (device trace: ~7-10 ms at 4K
b=4 against ~1 ms of irreducible traffic). This kernel DMAs each row tile
(+halo) of the image into VMEM once and runs ALL passes there — window
counts/means, the three residual-accumulation moment passes, the
scale-aware ridge, the LDL inverse pivots, the rank-deficiency flag, and
the diag(L) member sum — writing the 12 result planes per tile.

Math is a line-for-line port of solvers/matting._precompute (reference
semantics documented there; pymatting parity cites matting_refine.py:147):
residual-accumulated moments (cancellation-free at any conditioning),
eps_w = max(eps, 1e-5*tr) ridge, factored quadratic form for diag. Results
match the XLA path to f32 rounding (different fusion order only); the
solver's tests assert uint8-identical alphas end to end.

Used for the half_stats=True f32 radius-1 path (the pipeline hot path) on
TPU; other configurations keep the XLA formulation. Off-TPU the kernel
runs in interpreter mode so CPU tests pin semantics.

Layout mirrors kernels/pallas_matting.py (the repo's halo-DMA reference
pattern): 1-D grid over row tiles; each step copies rows [i*T, i*T+T+8)
of the (4, Hp, Wp) [valid, r, g, b] stack HBM->VMEM (halo 2: window stats
at +-1 of the output row need image rows at +-2), computes on the center
grid, and stores the (12, T, Wp) output block column-rebased to lane 0.
Output plane order: [i1, i2, i3, l21, l31, l32, diag, n, mu_r, mu_g,
mu_b, rankdef].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 16  # 32 exceeded the 16M scoped-VMEM limit (Mosaic keeps the
            # unrolled passes' intermediate planes live)
_HALO = 2        # diag needs window stats at +-1, window stats need img +-1
_LOAD_EXTRA = 8  # >= 2*_HALO, 8-aligned for Mosaic DMA
_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_DELTA = 1e-5    # f32 scale-aware ridge (solvers/matting._precompute)

_NPLANES_IN = 4    # valid, img_r, img_g, img_b
_NPLANES_OUT = 12


def _kernel(eps_ref, static_ref, out_ref, s_scr, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)
    T = out_ref.shape[2]
    Wp = out_ref.shape[3]
    eps = eps_ref[0, 0]

    dma = pltpu.make_async_copy(
        static_ref.at[b, :, pl.ds(i * T, T + _LOAD_EXTRA), :], s_scr, sems)
    dma.start()
    dma.wait()

    v = s_scr[0]
    img = [s_scr[1], s_scr[2], s_scr[3]]

    Tc = T + 2          # center rows: padded rows 1 .. T+2
    Wc = Wp - 2         # center cols: padded cols 1 .. Wp-1

    def ctr(x, dy=0, dx=0):
        """(Tc, Wc) view of x shifted by (dy,dx) about the center grid."""
        return x[1 + dy:1 + dy + Tc, 1 + dx:1 + dx + Wc]

    # ---- window counts and means -------------------------------------------
    n = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        n = n + ctr(v, dy, dx)
    n_safe = jnp.maximum(n, 1.0)
    mu = []
    for c in range(3):
        s = jnp.zeros((Tc, Wc), jnp.float32)
        for dy, dx in _SHIFTS:
            s = s + ctr(v, dy, dx) * ctr(img[c], dy, dx)
        mu.append(s / n_safe)

    # ---- pass A: first-channel moments + covariance trace ------------------
    a00 = jnp.zeros((Tc, Wc), jnp.float32)
    a01 = jnp.zeros((Tc, Wc), jnp.float32)
    a02 = jnp.zeros((Tc, Wc), jnp.float32)
    a11 = jnp.zeros((Tc, Wc), jnp.float32)
    a22 = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        vv = ctr(v, dy, dx)
        d0 = (ctr(img[0], dy, dx) - mu[0]) * vv
        d1 = (ctr(img[1], dy, dx) - mu[1]) * vv
        d2 = (ctr(img[2], dy, dx) - mu[2]) * vv
        a00 = a00 + d0 * d0
        a01 = a01 + d0 * d1
        a02 = a02 + d0 * d2
        a11 = a11 + d1 * d1
        a22 = a22 + d2 * d2
    eps_w = jnp.maximum(eps, _DELTA * (a00 + a11 + a22))
    p1 = a00 + eps_w
    l21 = a01 / p1
    l31 = a02 / p1

    # ---- pass B: residuals of ch2/ch3 on ch1 -------------------------------
    q22 = jnp.zeros((Tc, Wc), jnp.float32)
    q23 = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        vv = ctr(v, dy, dx)
        d0 = (ctr(img[0], dy, dx) - mu[0]) * vv
        d1 = (ctr(img[1], dy, dx) - mu[1]) * vv
        d2 = (ctr(img[2], dy, dx) - mu[2]) * vv
        r2 = d1 - l21 * d0
        r3 = d2 - l31 * d0
        q22 = q22 + vv * r2 * r2
        q23 = q23 + vv * r2 * r3
    p2 = q22 + eps_w * (1.0 + l21 * l21)
    l32 = (q23 + eps_w * l21 * l31) / p2

    # ---- pass C: residual of ch3 on (ch1, ch2) -----------------------------
    q3 = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        vv = ctr(v, dy, dx)
        d0 = (ctr(img[0], dy, dx) - mu[0]) * vv
        d1 = (ctr(img[1], dy, dx) - mu[1]) * vv
        d2 = (ctr(img[2], dy, dx) - mu[2]) * vv
        rr = (d2 - l31 * d0) - l32 * (d1 - l21 * d0)
        q3 = q3 + vv * rr * rr
    bq = l21 * l32 - l31
    p3 = q3 + eps_w * (bq * bq + l32 * l32 + 1.0)

    tr = a00 + a11 + a22
    rankdef = jnp.where((q3 < 1e-5 * tr) & (tr > 1e-4), 1.0, 0.0)

    i1 = n / p1
    i2 = n / p2
    i3 = n / p3

    # ---- diag(L): member-indexed sum over covering windows -----------------
    # diag_i = n_i - sum_s v(i+s) * (1 + quad(I_i - mu_{i+s}; window i+s))
    #          / n_{i+s};  quad via the LDL factors:
    # u0 = d0, u1 = d1 - l21 d0, u2 = bq d0 - l32 d1 + d2,
    # quad = i1 u0^2 + i2 u1^2 + i3 u2^2.
    To = T
    Wo = Wp - 4

    def out_grid(x, dy=0, dx=0):
        """(To, Wo) view at center-grid offset (1+dy, 1+dx)."""
        return x[1 + dy:1 + dy + To, 1 + dx:1 + dx + Wo]

    pix = [img[c][2:2 + To, 2:2 + Wo] for c in range(3)]
    diag_sum = jnp.zeros((To, Wo), jnp.float32)
    for dy, dx in _SHIFTS:
        d0 = pix[0] - out_grid(mu[0], dy, dx)
        d1 = pix[1] - out_grid(mu[1], dy, dx)
        d2 = pix[2] - out_grid(mu[2], dy, dx)
        kl21 = out_grid(l21, dy, dx)
        kl31 = out_grid(l31, dy, dx)
        kl32 = out_grid(l32, dy, dx)
        u1 = d1 - kl21 * d0
        u2 = (kl21 * kl32 - kl31) * d0 - kl32 * d1 + d2
        quad = (out_grid(i1, dy, dx) * d0 * d0
                + out_grid(i2, dy, dx) * u1 * u1
                + out_grid(i3, dy, dx) * u2 * u2)
        nn = jnp.maximum(out_grid(n, dy, dx), 1.0)
        vv = out_grid(ctr(v), dy, dx)  # validity of window i+s
        diag_sum = diag_sum + vv * (1.0 + quad) / nn
    diag = out_grid(n) - diag_sum

    # ---- store, column-rebased to lane 0 (pixel col x = padded col 2+x) ----
    zeros_tail = jnp.zeros((To, Wp - Wo), jnp.float32)
    vals = [out_grid(a) for a in (i1, i2, i3, l21, l31, l32)]
    vals += [diag, out_grid(n)]
    vals += [out_grid(m) for m in mu]
    vals += [out_grid(rankdef)]
    for plane, val in enumerate(vals):
        out_ref[0, plane, :, 0:Wo] = val
        out_ref[0, plane, :, Wo:Wp] = zeros_tail


def _aligned_wp(w: int) -> int:
    return -(-(w + 2 * _HALO) // 128) * 128


def _precompute_batched(images: jnp.ndarray, epsilon) -> jnp.ndarray:
    """(B, H, W, 3) f32 -> (B, 12, H, W) result planes.

    The batch is a leading GRID dimension (vmapping a manual-DMA
    pallas_call does not lower on TPU — memory_space=ANY operands must
    keep a trivial index map), so batching is explicit here and
    `precompute_planes` routes vmap to it via custom_vmap.
    """
    bsz, h, w = images.shape[:3]
    wp = _aligned_wp(w)
    nt = -(-h // _TILE)
    hp = nt * _TILE + _LOAD_EXTRA
    pads = ((0, 0), (_HALO, hp - h - _HALO), (_HALO, wp - w - _HALO))

    chans = [jnp.pad(jnp.ones((bsz, h, w), jnp.float32), pads)]
    chans += [jnp.pad(images[..., c].astype(jnp.float32), pads)
              for c in range(3)]
    stack = jnp.stack(chans, axis=1)  # (B, 4, Hp, Wp)

    eps = jnp.full((1, 1), epsilon, jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _NPLANES_OUT, _TILE, wp),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, _NPLANES_OUT, nt * _TILE, wp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_NPLANES_IN, _TILE + _LOAD_EXTRA, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() not in ("tpu",),
    )(eps, stack)
    return out[:, :, :h, :w]


@jax.custom_batching.custom_vmap
def precompute_planes(image01: jnp.ndarray, epsilon) -> jnp.ndarray:
    """Run the fused precompute. image01 (H, W, 3) f32 in [0,1].

    Returns (12, H, W) f32 planes [i1, i2, i3, l21, l31, l32, diag, n,
    mu_r, mu_g, mu_b, rankdef] matching solvers/matting._precompute's
    half_stats outputs to f32 rounding. vmap over images routes to the
    batched grid (see _precompute_batched).
    """
    return _precompute_batched(image01[None], epsilon)[0]


@precompute_planes.def_vmap
def _precompute_vmap_rule(axis_size, in_batched, images, epsilon):
    img_batched, eps_batched = in_batched
    if eps_batched or not img_batched:
        raise NotImplementedError(
            "precompute_planes: vmap over epsilon is not supported")
    return _precompute_batched(images, epsilon), True
