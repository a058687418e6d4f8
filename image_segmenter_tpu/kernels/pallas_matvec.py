"""Pallas TPU kernel: the matting-Laplacian CG MATVEC in one fused pass.

solvers/matting._matvec applies L·p with ~5 XLA fusions per iteration
(pad, 9-shift covariance, LDL solve, two member boxes), re-reading the
image / window-stat planes from HBM several times; the device trace puts
the CG stage at ~1.2 ms/iteration at 576x1024 b=4 against ~0.5 ms of
irreducible operand traffic (13 f32 planes read + 1 read + 1 write). This
kernel DMAs each row tile (+halo) of the loop-invariant operand stack and
of p into VMEM once per iteration and runs the whole matvec there.

Math is a line-for-line port of solvers/matting._matvec for the packed-
LDL (half_stats) radius-1 f32 path, with identical accumulation orders:
the separable box (columns summed over dx, then rows over dy — matching
_box), the shift-major covariance loop, and _matvec3_fact's factored
triangular solves. Out-of-image window positions (reachable in the halo)
are masked by n > 0, which the zero-padded XLA formulation got from
zero-padding `a`/`b` before their member boxes — identical in-bounds
values either way. Off-TPU the kernel runs in interpreter mode so CPU
tests pin semantics against the XLA path.

Reference behavior: pymatting's cg(L, b) hot loop (matting_refine.py:
147-157 call chain); this kernel only changes the schedule of A·p,
not the operator.

Measured on v5e at 576x1024 (bench/micro_matvec.py, 50-matvec amortized,
bit-exact vs the XLA path): b=4 XLA 1.47 ms/matvec, manual-DMA kernel
1.42, tiled-pipelined T=32 0.92 (1.6x); b=1 XLA 0.54 vs tiled 0.64 —
the single-image grid is too short to hide the pipeline ramp, but the
pipeline's vmapped b=4 solve is the hot caller, so tiled ships for both.

Layout mirrors kernels/pallas_precompute.py: 1-D row-tile grid per batch
element; each step copies rows [i*T, i*T+T+8) of the (13, Hp, Wp) static
stack [n, mu_r, mu_g, mu_b, i1, i2, i3, l21, l31, l32, img_r, img_g,
img_b] and of the padded p plane HBM->VMEM, computes windows on the
center grid (halo 1) and the member sum on the output grid (halo 2), and
stores the (T, Wp) output block column-rebased to lane 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 32       # v5e sweep: T=32 tiled-pipelined wins (0.92 ms/matvec
                 # b=4 at 576x1024 vs 1.10 at T=16; T=64 fails to lower)
_HALO = 2        # member box needs windows at +-1, windows need p at +-1
_LOAD_EXTRA = 8  # >= 2*_HALO, 8-aligned for Mosaic DMA
_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

_NPLANES = 13  # n, mu(3), ldl factors(6), img(3)


def _kernel(static_ref, p_ref, out_ref, s_scr, p_scr, sems):
    """Manual-DMA variant: one serialized halo-tile copy per grid step.

    Kept as the no-extra-HBM fallback; the shipped path is _kernel_tiled
    (BlockSpec pipelining), which measured 22% faster at T=64 because the
    DMA wait here does not overlap compute."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    T = out_ref.shape[1]

    dma_s = pltpu.make_async_copy(
        static_ref.at[b, :, pl.ds(i * T, T + _LOAD_EXTRA), :], s_scr,
        sems.at[0])
    dma_p = pltpu.make_async_copy(
        p_ref.at[b, pl.ds(i * T, T + _LOAD_EXTRA), :], p_scr, sems.at[1])
    dma_s.start()
    dma_p.start()
    dma_s.wait()
    dma_p.wait()

    _compute_tile(s_scr, p_scr, out_ref.at[0])


def _kernel_tiled(s_ref, p_ref, out_ref):
    """BlockSpec variant: operands arrive as pre-overlapped tiles, so
    Pallas's automatic block pipelining double-buffers the HBM->VMEM loads
    behind compute (the manual-DMA kernel serializes them: measured
    1.09 vs 1.32 ms/matvec XLA at T=64 — the DMA wait is the gap)."""
    _compute_tile(s_ref[0, 0], p_ref[0, 0], out_ref.at[0, 0])


def _compute_tile(s, p, out_ref):
    """The matvec math on one (13, T+8, Wp) static tile + (T+8, Wp) p
    tile, writing the (T, Wp) output block. Shared by both kernels."""
    T = out_ref.shape[0]
    Wp = out_ref.shape[1]

    n = s[0]
    mu = [s[1], s[2], s[3]]
    i1, i2, i3 = s[4], s[5], s[6]
    l21, l31, l32 = s[7], s[8], s[9]
    img = [s[10], s[11], s[12]]

    Tc = T + 2
    Wc = Wp - 2

    def ctr(x, dy=0, dx=0):
        return x[1 + dy:1 + dy + Tc, 1 + dx:1 + dx + Wc]

    cols_p = p[:, 0:Wc] + p[:, 1:1 + Wc] + p[:, 2:2 + Wc]
    psum = (cols_p[0:Tc] + cols_p[1:1 + Tc] + cols_p[2:2 + Tc])

    nk = ctr(n)
    valid = nk > 0.0
    n_div = jnp.maximum(nk, 1.0)
    pbar = psum / n_div

    cov = [jnp.zeros((Tc, Wc), jnp.float32) for _ in range(3)]
    muc = [ctr(mu[c]) for c in range(3)]
    for dy, dx in _SHIFTS:
        vp = ctr(p, dy, dx)
        for c in range(3):
            cov[c] = cov[c] + (ctr(img[c], dy, dx) - muc[c]) * vp

    ki1, ki2, ki3 = ctr(i1), ctr(i2), ctr(i3)
    kl21, kl31, kl32 = ctr(l21), ctr(l31), ctr(l32)
    bq = kl21 * kl32 - kl31
    v0 = cov[0] / n_div
    v1 = cov[1] / n_div
    v2 = cov[2] / n_div
    t1 = v1 - kl21 * v0
    t2 = bq * v0 - kl32 * v1 + v2
    w0 = ki1 * v0
    w1 = ki2 * t1
    w2 = ki3 * t2
    a0 = w0 - kl21 * w1 + bq * w2
    a1 = w1 - kl32 * w2
    a2 = w2
    bb = pbar - ((a0 * muc[0] + a1 * muc[1]) + a2 * muc[2])
    bb = jnp.where(valid, bb, 0.0)

    To = T
    Wo = Wp - 4

    def member_box(x):
        cols = x[:, 0:Wo] + x[:, 1:1 + Wo] + x[:, 2:2 + Wo]
        return cols[0:To] + cols[1:1 + To] + cols[2:2 + To]

    bs_a = [member_box(a) for a in (a0, a1, a2)]
    bs_b = member_box(bb)

    pix = [img[c][2:2 + To, 2:2 + Wo] for c in range(3)]
    cnt_i = n[2:2 + To, 2:2 + Wo]
    p_i = p[2:2 + To, 2:2 + Wo]
    out = cnt_i * p_i - (((bs_a[0] * pix[0] + bs_a[1] * pix[1])
                          + bs_a[2] * pix[2]) + bs_b)

    out_ref[:, 0:Wo] = out
    out_ref[:, Wo:Wp] = jnp.zeros((To, Wp - Wo), jnp.float32)


def _aligned_wp(w: int) -> int:
    return -(-(w + 2 * _HALO) // 128) * 128


def build_matvec_stack(image: jnp.ndarray, n: jnp.ndarray, mu: jnp.ndarray,
                       dinv6: jnp.ndarray) -> jnp.ndarray:
    """Assemble the loop-invariant operand stack ONCE per solve.

    image (H, W, 3), n (H, W), mu (H, W, 3), dinv6 (H, W, 6) f32 ->
    (13, Hp, Wp) zero-padded planes. Built outside the CG while_loop so
    its pad/stack is paid once (XLA does not hoist it out of the loop —
    the round-3 image-pad lesson).
    """
    h, w = n.shape
    wp = _aligned_wp(w)
    nt = -(-h // _TILE)
    hp = nt * _TILE + _LOAD_EXTRA
    pads = ((_HALO, hp - h - _HALO), (_HALO, wp - w - _HALO))

    planes = [jnp.pad(n.astype(jnp.float32), pads)]
    planes += [jnp.pad(mu[..., c].astype(jnp.float32), pads)
               for c in range(3)]
    planes += [jnp.pad(dinv6[..., c].astype(jnp.float32), pads)
               for c in range(6)]
    planes += [jnp.pad(image[..., c].astype(jnp.float32), pads)
               for c in range(3)]
    return jnp.stack(planes, axis=0)


def build_matvec_stack_planes(image: jnp.ndarray,
                              planes: jnp.ndarray) -> jnp.ndarray:
    """build_matvec_stack from the Pallas precompute's native plane-major
    output (kernels/pallas_precompute.py: (12, H, W) planes [i1, i2, i3,
    l21, l31, l32, diag, n, mu_r, mu_g, mu_b, rankdef]).

    Identical floats to build_matvec_stack(image, n, mu, dinv6) — the same
    planes in the same order — but assembled by plane-axis slices instead
    of round-tripping through the channel-last (H, W, 6)/(H, W, 3) views
    _precompute exposes. That round trip (moveaxis to channel-last, then
    [..., c] slices back to planes here) made XLA materialize the
    (B, 12, H, W) precompute output in a channel-major layout: the round-5
    HLO copy audit (bench/hlo_copies.py) showed 4x 127 MB
    {3,2,1,0}->{3,2,0,1} relayout copies of exactly this array at 4K b=4 —
    the largest single family of the 7.27 ms device-lane copy bucket.
    Slicing the plane axis directly keeps every consumer in the kernel's
    native layout and lets the channel-last views DCE away.
    """
    h, w = planes.shape[1:]
    wp = _aligned_wp(w)
    nt = -(-h // _TILE)
    hp = nt * _TILE + _LOAD_EXTRA
    pads = ((0, 0), (_HALO, hp - h - _HALO), (_HALO, wp - w - _HALO))
    # [n, mu_r, mu_g, mu_b] + [i1, i2, i3, l21, l31, l32] — the stack order
    # _kernel expects (s[0]=n, s[1:4]=mu, s[4:10]=ldl, s[10:13]=img).
    sel = jnp.concatenate([planes[7:11], planes[0:6]], axis=0)
    img_p = jnp.moveaxis(image.astype(jnp.float32), -1, 0)
    return jnp.concatenate([jnp.pad(sel, pads), jnp.pad(img_p, pads)],
                           axis=0)


def _matvec_batched(stack: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(B, 13, Hp, Wp) stack + (B, H, W) p -> (B, H, W) L @ p."""
    bsz, h, w = p.shape
    wp = stack.shape[3]
    nt = (stack.shape[2] - _LOAD_EXTRA) // _TILE
    hp = stack.shape[2]
    pads = ((0, 0), (_HALO, hp - h - _HALO), (_HALO, wp - w - _HALO))
    p_pad = jnp.pad(p.astype(jnp.float32), pads)

    out = pl.pallas_call(
        _kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _TILE, wp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nt * _TILE, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_NPLANES, _TILE + _LOAD_EXTRA, wp), jnp.float32),
            pltpu.VMEM((_TILE + _LOAD_EXTRA, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() not in ("tpu",),
    )(stack, p_pad)
    return out[:, :h, :w]


def tile_stack(stack: jnp.ndarray) -> jnp.ndarray:
    """(13, Hp, Wp) padded stack -> (nt, 13, T+8, Wp) overlapped tiles.

    Materialized ONCE per solve (loop-invariant; the 8-row overlap costs
    ~12% extra HBM) so the kernel can use plain BlockSpecs, which Pallas
    double-buffers automatically."""
    nt = (stack.shape[1] - _LOAD_EXTRA) // _TILE
    return jnp.stack([stack[:, i * _TILE:i * _TILE + _TILE + _LOAD_EXTRA]
                      for i in range(nt)], axis=0)


def _tile_p(p_pad: jnp.ndarray, nt: int) -> jnp.ndarray:
    """(B, Hp, Wp) padded p -> (B, nt, T+8, Wp) overlapped tiles (per
    CG iteration; ~0.1 ms of XLA copies at 576x1024 b=4)."""
    return jnp.stack([p_pad[:, i * _TILE:i * _TILE + _TILE + _LOAD_EXTRA]
                      for i in range(nt)], axis=1)


def _matvec_batched_tiled(stack_t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(B, nt, 13, T+8, Wp) tiled stack + (B, H, W) p -> (B, H, W) L @ p."""
    bsz, h, w = p.shape
    nt, _, tl, wp = stack_t.shape[1:]
    hp = nt * _TILE + _LOAD_EXTRA
    pads = ((0, 0), (_HALO, hp - h - _HALO), (_HALO, wp - w - _HALO))
    p_t = _tile_p(jnp.pad(p.astype(jnp.float32), pads), nt)

    out = pl.pallas_call(
        _kernel_tiled,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, _NPLANES, tl, wp),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tl, wp), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _TILE, wp), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nt, _TILE, wp), jnp.float32),
        interpret=jax.default_backend() not in ("tpu",),
    )(stack_t, p_t)
    return out.reshape(bsz, nt * _TILE, wp)[:, :h, :w]


@jax.custom_batching.custom_vmap
def matvec_planes_tiled(stack_t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """L @ p from the overlap-tiled operand stack (tile_stack). Same math
    as matvec_planes; pipelined BlockSpec loads instead of manual DMA."""
    return _matvec_batched_tiled(stack_t[None], p[None])[0]


@matvec_planes_tiled.def_vmap
def _matvec_tiled_vmap_rule(axis_size, in_batched, stack_t, p):
    stack_b, p_b = in_batched
    if not (stack_b and p_b):
        raise NotImplementedError(
            "matvec_planes_tiled: vmap requires both stack and p batched")
    return _matvec_batched_tiled(stack_t, p), True


@jax.custom_batching.custom_vmap
def matvec_planes(stack: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """L @ p from the padded operand stack. stack (13, Hp, Wp), p (H, W).

    Matches solvers/matting._matvec (packed-LDL f32 radius-1 path) to f32
    rounding with identical accumulation orders. vmap over (stack, p)
    routes to the batched grid.
    """
    return _matvec_batched(stack[None], p[None])[0]


@matvec_planes.def_vmap
def _matvec_vmap_rule(axis_size, in_batched, stack, p):
    stack_b, p_b = in_batched
    if not (stack_b and p_b):
        raise NotImplementedError(
            "matvec_planes: vmap requires both stack and p batched")
    return _matvec_batched(stack, p), True
