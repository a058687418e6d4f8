"""Pallas TPU kernel: fused matting-Laplacian matvec (MEASURED-NEGATIVE —
kept as reference, not wired into the solver).

Hypothesis (ROADMAP item 2): the CG matvec re-reads its operands every
iteration, so a kernel that performs both window-sum passes per row-tile in
VMEM and recomputes the derived operands (mu_k, n_k) from resident planes
should beat XLA by cutting intermediate traffic. Measured on the v5e chip
at 576x1024 (the pipeline's matting shape, 50 matvecs amortized in one
dispatch): XLA 0.683 ms/matvec, this kernel 0.753 ms — XLA's own fusion of
the shift-stencil formulation already runs at the HBM roofline (~38 MB of
irreducible operands per matvec at ~55 GB/s effective), leaving no traffic
to remove. The kernel stays because (a) it documents that conclusion with
a reproducible artifact, (b) it is the repo's reference pattern for
manual-DMA halo tiling (overlapping reads cannot be expressed with block
index maps), and (c) its CPU-interpret tests pin the semantics should a
future chip shift the roofline.

Numerics match solvers/matting exactly in structure: the covariance
accumulation is CENTERED ((I_j - mu_k) differences before products — the
box-minus form loses ~2 digits on flat regions, see solvers/matting
docstring), and the window inverse applies as the packed-factor transform
(kernels must stay consistent with the operator CG certifies against).
Verified against the XLA matvec to ~3e-7 relative.

The loop-invariant operands (validity, image, factors) pack ONCE into a
(10, Hp, Wp) stack; only the 1-plane p repacks per CG iteration. Grid:
1-D over row tiles; each step DMAs the tile+halo slices of both stacks
HBM -> VMEM (radius 2 = two stacked 3x3 passes), computes, writes its
(T, Wp) output block. Off-TPU the kernel runs in interpreter mode so CPU
tests exercise identical code.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 32      # output rows per grid step (64 overflowed the 16M VMEM stack)
_HALO = 2       # two stacked radius-1 window passes
_LOAD_EXTRA = 8  # rows loaded beyond T (>= 2*_HALO, 8-aligned for Mosaic DMA)
_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

# plane indices in the static operand stack
_V, _R, _G, _B = 0, 1, 2, 3
_F0 = 4  # factors f0..f5 at planes 4..9
_NSTATIC = 10


def _kernel(p_ref, static_ref, out_ref, p_scr, s_scr, sems):
    i = pl.program_id(0)
    T = out_ref.shape[0]
    Wp = out_ref.shape[1]

    # Mosaic requires HBM slice extents aligned to the (8, 128) tiling:
    # load T + 8 rows (>= the T + 4 the stencil needs; arrays are padded so
    # the tail over-read stays in bounds).
    dma_p = pltpu.make_async_copy(
        p_ref.at[pl.ds(i * T, T + _LOAD_EXTRA), :], p_scr, sems.at[0])
    dma_s = pltpu.make_async_copy(
        static_ref.at[:, pl.ds(i * T, T + _LOAD_EXTRA), :], s_scr, sems.at[1])
    dma_p.start()
    dma_s.start()
    dma_p.wait()
    dma_s.wait()

    p = p_scr[:, :]
    v = s_scr[_V]
    img = [s_scr[_R], s_scr[_G], s_scr[_B]]
    f = [s_scr[_F0 + k] for k in range(6)]

    Tc = T + 2          # center rows: padded rows 1 .. T+2
    Wc = Wp - 2         # center cols: padded cols 1 .. Wp-2

    def ctr(x, dy=0, dx=0):
        """(Tc, Wc) view of x shifted by (dy,dx) about the center grid."""
        return x[1 + dy:1 + dy + Tc, 1 + dx:1 + dx + Wc]

    # ---- pass 1: per-center window stats and (a, b) ------------------------
    n = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        n = n + ctr(v, dy, dx)
    ninv = 1.0 / jnp.maximum(n, 1.0)

    vp = v * p
    mu = []
    for c in range(3):
        s = jnp.zeros((Tc, Wc), jnp.float32)
        for dy, dx in _SHIFTS:
            s = s + ctr(v, dy, dx) * ctr(img[c], dy, dx)
        mu.append(s * ninv)
    pbar = jnp.zeros((Tc, Wc), jnp.float32)
    for dy, dx in _SHIFTS:
        pbar = pbar + ctr(vp, dy, dx)
    pbar = pbar * ninv

    cov = [jnp.zeros((Tc, Wc), jnp.float32) for _ in range(3)]
    for dy, dx in _SHIFTS:
        w = ctr(vp, dy, dx)
        for c in range(3):
            cov[c] = cov[c] + (ctr(img[c], dy, dx) - mu[c]) * w

    # packed-factor apply: dinv @ (cov * ninv)
    i1, i2, i3, l21, l31, l32 = [ctr(fk) for fk in f]
    bq = l21 * l32 - l31
    c0, c1, c2 = cov[0] * ninv, cov[1] * ninv, cov[2] * ninv
    t1 = c1 - l21 * c0
    t2 = bq * c0 - l32 * c1 + c2
    w0 = i1 * c0
    w1 = i2 * t1
    w2 = i3 * t2
    a0 = w0 - l21 * w1 + bq * w2
    a1 = w1 - l32 * w2
    a2 = w2
    bsc = pbar - (a0 * mu[0] + a1 * mu[1] + a2 * mu[2])

    # only real windows (center pixel in-bounds) contribute
    vc = ctr(v)
    a0 = a0 * vc
    a1 = a1 * vc
    a2 = a2 * vc
    bsc = bsc * vc

    # ---- pass 2: box-sum (a, b) over covering windows ----------------------
    # output pixel at padded (2 + y, 2 + x) sums centers (1+y+dy, 1+x+dx):
    # in center-grid coordinates that is (y + 1 + dy, x + 1 + dx).
    def boxc(x):
        s = jnp.zeros((T, Wp - 4), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = s + x[1 + dy:1 + dy + T, 1 + dx:1 + dx + Wp - 4]
        return s

    acc = boxc(bsc)
    for c, ac in zip(range(3), (a0, a1, a2)):
        acc = acc + boxc(ac) * img[c][2:2 + T, 2:2 + Wp - 4]

    cnt = n[1:1 + T, 1:1 + Wp - 4]
    p_out = p[2:2 + T, 2:2 + Wp - 4]
    q = cnt * p_out - acc

    # aligned store: q re-based at lane 0 (Mosaic has no scatter; a
    # lane-offset store would be one anyway). Column x of q = padded col
    # x + 2, so the caller slices [:H, :W] directly.
    out_ref[:, 0:Wp - 4] = q
    out_ref[:, Wp - 4:Wp] = jnp.zeros((T, 4), jnp.float32)


@jax.jit
def matvec_planes(p_pad: jnp.ndarray, static_planes: jnp.ndarray) -> jnp.ndarray:
    """q = L p from halo-padded operand planes.

    p_pad: (Hp, Wp) f32 — p zero-padded by _HALO on all sides (Wp 128-aligned).
    static_planes: (10, Hp, Wp) f32 — [valid, img_r, img_g, img_b, f0..f5]
    from `pack_static`. Returns (tiles * _TILE, Wp); the matvec lives at
    [:H, :W] — the caller slices.
    """
    nplanes, hp, wp = static_planes.shape
    assert nplanes == _NSTATIC
    h_eff = hp - 2 * _HALO
    nt = -(-h_eff // _TILE)
    hp_full = nt * _TILE + _LOAD_EXTRA
    if hp_full != hp:
        static_planes = jnp.pad(static_planes,
                                ((0, 0), (0, hp_full - hp), (0, 0)))
        p_pad = jnp.pad(p_pad, ((0, hp_full - hp), (0, 0)))

    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        _kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_TILE, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * _TILE, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE + _LOAD_EXTRA, wp), jnp.float32),
            pltpu.VMEM((_NSTATIC, _TILE + _LOAD_EXTRA, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p_pad, static_planes)
    return out


def _aligned_wp(w: int) -> int:
    return -(-(w + 2 * _HALO) // 128) * 128


def pad_p(p: jnp.ndarray) -> jnp.ndarray:
    """Halo-pad the iteration-varying p plane: (H, W) -> (H+4, Wp)."""
    h, w = p.shape
    wp = _aligned_wp(w)
    return jnp.pad(p, ((_HALO, _HALO), (_HALO, wp - w - _HALO)))


def pack_static(valid, image, factors):
    """Stack and halo-pad the loop-invariant operands once per solve.

    valid: (H, W) f32; image: (H, W, 3) f32; factors: (H, W, 6) f32.
    Returns (10, H+4, Wp) with Wp = W + 4 rounded up to 128.
    """
    h, w = valid.shape
    wp = _aligned_wp(w)
    pads = ((_HALO, _HALO), (_HALO, wp - w - _HALO))

    def pad2(x):
        return jnp.pad(x, pads)

    chans = [pad2(valid)]
    chans += [pad2(image[..., c]) for c in range(3)]
    chans += [pad2(factors[..., k]) for k in range(6)]
    return jnp.stack(chans)
