"""Property-based tests (hypothesis) for the scan/stencil kernels vs their
independent oracles (ROADMAP item 13).

Shapes are FIXED (16x20) so every drawn example reuses one compiled program;
hypothesis varies only the content (palette assignment, alpha mask,
threshold), which is what actually stresses the run-length / majority logic.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

H, W = 16, 20


def _image_from(draw_pick, draw_alpha):
    img = np.zeros((H, W, 4), np.uint8)
    pal = np.array([[200, 40, 40], [40, 180, 60], [10, 10, 200], [250, 250, 20]],
                   np.uint8)
    pick = np.array(draw_pick, np.int64).reshape(H, W)
    img[..., :3] = pal[pick]
    img[..., 3] = (np.array(draw_alpha, np.uint8).reshape(H, W)) * 255
    return img


image_strategy = st.tuples(
    st.lists(st.integers(0, 3), min_size=H * W, max_size=H * W),
    st.lists(st.integers(0, 1), min_size=H * W, max_size=H * W),
)


@settings(max_examples=30, deadline=None)
@given(data=image_strategy, thr=st.integers(1, 3))
def test_tendril_trim_matches_oracle(data, thr):
    """trim_tendrils (segmented-scan kernels) is bit-exact vs the pure-python
    oracle on arbitrary quantized images, for every threshold."""
    from processing.tendril_trimming import trim_tendrils
    from test_tendrils import _oracle_trim

    img = _image_from(*data)
    ours, it_ours, _ = trim_tendrils(img, thr)
    ref, it_ref = _oracle_trim(img, thr)
    np.testing.assert_array_equal(ours, ref)
    assert it_ours == it_ref


def _majority_oracle(cid, opaque):
    """Per-pixel spec oracle (test_smoothing_algorithms.py:1066-1106):
    interior opaque pixels with >= 3 of 4 opaque neighbors sharing one color
    adopt it; the reference counts the rule firing even when the color is
    unchanged."""
    h, w = cid.shape
    out = cid.copy()
    applied = 0
    differs = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            if not opaque[y, x]:
                continue
            votes = {}
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                if opaque[y + dy, x + dx]:
                    c = int(cid[y + dy, x + dx])
                    votes[c] = votes.get(c, 0) + 1
            if not votes:
                continue
            best = max(votes.values())
            if best >= 3:
                winners = [c for c, n in votes.items() if n == best]
                c = winners[0]
                applied += 1
                if c != int(cid[y, x]):
                    differs += 1
                    out[y, x] = c
    return out, applied, differs


@settings(max_examples=30, deadline=None)
@given(data=image_strategy)
def test_majority_step_matches_oracle(data):
    import jax.numpy as jnp
    from image_segmenter_tpu.kernels.majority import majority_step

    img = _image_from(*data)
    from image_segmenter_tpu.ops.color import pack_rgb_u32

    cid = np.asarray(pack_rgb_u32(jnp.asarray(img[..., :3])))
    opaque = img[..., 3] > 0
    new_cid, applied, differs = majority_step(jnp.asarray(cid), jnp.asarray(opaque))
    ref_cid, ref_applied, ref_differs = _majority_oracle(cid, opaque)
    np.testing.assert_array_equal(np.asarray(new_cid), ref_cid)
    assert int(applied) == ref_applied
    assert int(differs) == ref_differs


@settings(max_examples=25, deadline=None)
@given(data=image_strategy, conn=st.sampled_from([4, 8]))
def test_native_cc_matches_device_on_random(data, conn):
    """Host union-find CC == device label-propagation kernel on arbitrary
    color fields with transparency."""
    import jax.numpy as jnp
    from image_segmenter_tpu.ops import native as NAT
    from image_segmenter_tpu.ops.connected_components import component_stats

    img = _image_from(*data)
    cid = (img[..., 0].astype(np.int32) << 16) | \
          (img[..., 1].astype(np.int32) << 8) | img[..., 2].astype(np.int32)
    valid = img[..., 3] > 0
    res = NAT.label_components_host(cid, valid, conn)
    if res is None:
        import pytest

        pytest.skip("native library unavailable")
    lab_n, sz_n, bb_n = res
    lab_d, sz_d, bb_d = (np.asarray(x) for x in component_stats(
        jnp.asarray(cid), jnp.asarray(valid), conn))
    np.testing.assert_array_equal(lab_n, lab_d)
    np.testing.assert_array_equal(sz_n, sz_d)
    np.testing.assert_array_equal(bb_n, bb_d)


def test_pallas_precompute_matches_xla():
    """The fused one-pass Pallas precompute (kernels/pallas_precompute —
    the pipeline's TPU hot path) must match the XLA formulation's factors,
    diag, means, counts, and rank-deficiency flags to f32 rounding, on
    non-aligned shapes, under vmap, and across epsilon values."""
    import jax
    import jax.numpy as jnp
    from image_segmenter_tpu.solvers.matting import _precompute
    from image_segmenter_tpu.kernels.pallas_precompute import precompute_planes

    rng = np.random.default_rng(7)
    for h, w, eps in [(37, 53, 1e-7), (80, 129, 1e-6)]:
        img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        pre = _precompute(img, eps, 1, half_stats=True)
        planes = np.asarray(precompute_planes(img, eps))
        refs = ([np.asarray(pre.dinv[..., k]) for k in range(6)]
                + [np.asarray(pre.diag), np.asarray(pre.valid_n)]
                + [np.asarray(pre.mu[..., c]) for c in range(3)]
                + [np.asarray(pre.rankdef, np.float32)])
        for plane, ref in zip(planes, refs):
            err = np.abs(plane - ref)
            rel = err / np.maximum(np.abs(ref), 1e-30)
            # every entry is close in EITHER absolute or relative terms
            # (factors span ~9 decades; near-zero entries carry only
            # rounding-level absolute error)
            assert np.minimum(err, rel).max() < 1e-4

    # vmap must route through the batched grid and equal per-image calls
    imgs = jnp.asarray(rng.random((3, 37, 53, 3)), jnp.float32)
    batched = np.asarray(jax.vmap(lambda im: precompute_planes(im, 1e-7))(imgs))
    single = np.asarray(precompute_planes(imgs[1], 1e-7))
    np.testing.assert_array_equal(batched[1], single)


def test_pallas_matvec_matches_xla():
    """The manual-DMA halo-tiled Pallas matvec (kernels/pallas_matting — a
    measured-negative kept as the halo-DMA reference pattern) must equal the
    XLA stencil matvec to f32 rounding, including border-clipped windows and
    non-aligned shapes."""
    import jax.numpy as jnp
    from image_segmenter_tpu.solvers.matting import _precompute, _matvec
    from image_segmenter_tpu.kernels.pallas_matting import (
        pack_static, pad_p, matvec_planes)

    rng = np.random.default_rng(5)
    for h, w in [(37, 53), (80, 129)]:
        img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
        pre = _precompute(img, 1e-7, 1, half_stats=True)
        ref = np.asarray(_matvec(pre, p, 1))
        st = pack_static(jnp.ones((h, w), jnp.float32), img, pre.dinv)
        out = np.asarray(matvec_planes(pad_p(p), st))[:h, :w]
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(out - ref).max() / scale < 1e-5


def test_pallas_fused_matvec_matches_xla():
    """The round-4 fused CG matvec (kernels/pallas_matvec — reads the
    precomputed mu/n/factor planes instead of recomputing them) must match
    solvers/matting._matvec to f32 rounding on non-aligned shapes,
    including border-clipped windows, and route vmap through the batched
    grid."""
    import jax
    import jax.numpy as jnp
    from image_segmenter_tpu.solvers.matting import _precompute, _matvec
    from image_segmenter_tpu.kernels.pallas_matvec import (
        build_matvec_stack, matvec_planes, matvec_planes_tiled, tile_stack)

    rng = np.random.default_rng(11)
    for h, w in [(24, 40), (33, 130), (16, 128)]:
        img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
        pre = _precompute(img, 1e-7, 1, half_stats=True)
        ref = np.asarray(_matvec(pre, p, 1))
        stack = build_matvec_stack(pre.image, pre.valid_n, pre.mu, pre.dinv)
        scale = np.abs(ref).max() + 1e-9
        out = np.asarray(matvec_planes(stack, p))
        assert np.abs(out - ref).max() / scale < 1e-5
        out_t = np.asarray(matvec_planes_tiled(tile_stack(stack), p))
        assert np.abs(out_t - ref).max() / scale < 1e-5

    # vmap must route through the batched grid and equal per-image calls
    imgs = jnp.asarray(rng.random((2, 24, 40, 3)), jnp.float32)
    ps = jnp.asarray(rng.standard_normal((2, 24, 40)), jnp.float32)
    pres = jax.vmap(lambda im: _precompute(im, 1e-7, 1, half_stats=True))(imgs)
    stacks = jax.vmap(build_matvec_stack)(pres.image, pres.valid_n,
                                          pres.mu, pres.dinv)
    batched = np.asarray(jax.vmap(matvec_planes)(stacks, ps))
    single = np.asarray(matvec_planes(stacks[1], ps[1]))
    np.testing.assert_array_equal(batched[1], single)
    tiles = jax.vmap(tile_stack)(stacks)
    batched_t = np.asarray(jax.vmap(matvec_planes_tiled)(tiles, ps))
    single_t = np.asarray(matvec_planes_tiled(tiles[1], ps[1]))
    np.testing.assert_array_equal(batched_t[1], single_t)
    np.testing.assert_array_equal(batched_t, batched)


def test_matvec_stack_from_planes_bit_identical():
    """build_matvec_stack_planes (plane-major assembly straight from the
    Pallas precompute output — the round-5 relayout-copy fix) must produce
    the bit-identical operand stack to build_matvec_stack fed the
    channel-last views, single and vmapped."""
    import jax
    import jax.numpy as jnp
    from image_segmenter_tpu.kernels.pallas_matvec import (
        build_matvec_stack, build_matvec_stack_planes)
    from image_segmenter_tpu.kernels.pallas_precompute import (
        precompute_planes)

    rng = np.random.default_rng(17)
    for h, w in [(24, 40), (33, 130)]:
        img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        planes = precompute_planes(img, 1e-7)
        dinv6 = jnp.moveaxis(planes[0:6], 0, -1)
        mu3 = jnp.moveaxis(planes[8:11], 0, -1)
        ref = np.asarray(build_matvec_stack(img, planes[7], mu3, dinv6))
        got = np.asarray(build_matvec_stack_planes(img, planes))
        np.testing.assert_array_equal(got, ref)

    imgs = jnp.asarray(rng.random((2, 24, 40, 3)), jnp.float32)
    planes_b = jax.vmap(lambda im: precompute_planes(im, 1e-7))(imgs)
    got_b = np.asarray(jax.vmap(build_matvec_stack_planes)(imgs, planes_b))
    for i in range(2):
        single = np.asarray(build_matvec_stack_planes(imgs[i], planes_b[i]))
        np.testing.assert_array_equal(got_b[i], single)


def test_quantize_map_matches_oracle():
    """quantize_map (2-D native blocking, the round-5 relayout-copy fix)
    matches a numpy nearest-palette oracle bit-exactly, including the
    black-filter + transparency masking, on shapes that are NOT multiples
    of the (128, 128) block (pad-and-slice path) and ones that are."""
    import jax.numpy as jnp
    from image_segmenter_tpu.kernels.pallas_quantize import quantize_map

    rng = np.random.default_rng(23)
    pal = np.array([[200, 40, 40], [40, 180, 60], [10, 10, 200],
                    [250, 250, 20], [5, 5, 5]], np.float32)
    for h, w in [(16, 20), (130, 257), (128, 128)]:
        rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
        alpha = (rng.random((h, w)) > 0.3).astype(np.uint8) * 255
        thr = np.float32(40.0)

        got = np.asarray(quantize_map(
            jnp.asarray(rgb), jnp.asarray(alpha), jnp.asarray(
                np.pad(pal, ((0, 3), (0, 0)))), jnp.int32(5), thr, k_max=8))

        d = ((rgb.astype(np.float32)[:, :, None, :] -
              pal[None, None, :, :]) ** 2).sum(-1)
        mapped = pal[d.argmin(-1)].astype(np.int32).astype(np.uint8)
        # match the kernel's f32 (r+g+b)*(1/3) exactly (not /3: the f32
        # reciprocal product differs at threshold-boundary sums)
        bright = rgb.astype(np.float32).sum(-1) * np.float32(1.0 / 3.0)
        fit = (alpha > 0) & (bright > thr)
        ref = np.where(fit[..., None], mapped, 0).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)


@settings(max_examples=20, deadline=None)
@given(data=st.lists(st.integers(0, 1), min_size=H * W, max_size=H * W),
       ksize=st.sampled_from([(3, 3), (5, 5), (3, 5)]),
       shape=st.sampled_from(["ellipse", "rect", "cross"]),
       op=st.sampled_from(["dilate", "erode"]))
def test_binary_morphology_matches_cv2(data, ksize, shape, op):
    """dilate/erode == cv2 bit-exactly on arbitrary masks, for every SE
    shape the panels expose."""
    import cv2 as cv
    import jax.numpy as jnp
    from image_segmenter_tpu.ops import morphology as M

    mask = (np.array(data, np.uint8).reshape(H, W)) * 255
    se = M.structuring_element(shape, ksize)
    # both take cv2's (width, height) tuple convention
    cv_se = cv.getStructuringElement(
        {"ellipse": cv.MORPH_ELLIPSE, "rect": cv.MORPH_RECT,
         "cross": cv.MORPH_CROSS}[shape], ksize)
    if op == "dilate":
        ours = np.asarray(M.dilate_binary(jnp.asarray(mask), se))
        ref = cv.dilate(mask, cv_se) > 0
    else:
        ours = np.asarray(M.erode_binary(jnp.asarray(mask), se))
        ref = cv.erode(mask, cv_se) > 0
    np.testing.assert_array_equal(ours, ref)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       dst=st.sampled_from([(7, 9), (31, 17), (40, 64)]))
def test_nearest_resize_matches_cv2(seed, dst):
    import cv2 as cv
    import jax.numpy as jnp
    from image_segmenter_tpu.ops import resize as RZ

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (H, W, 3), np.uint8)
    ours = np.asarray(RZ.resize_u8(jnp.asarray(img), dst, RZ.NEAREST_CV))
    ref = cv.resize(img, (dst[1], dst[0]), interpolation=cv.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_area_resize_matches_cv2(seed):
    """INTER_AREA on integer factors is an exact box mean — bit-exact vs
    cv2 on arbitrary content."""
    import cv2 as cv
    import jax.numpy as jnp
    from image_segmenter_tpu.ops import resize as RZ

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (H * 2, W * 2, 3), np.uint8)
    ours = np.asarray(RZ.resize_u8(jnp.asarray(img), (H, W), RZ.AREA))
    ref = cv.resize(img, (W, H), interpolation=cv.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       n=st.sampled_from([1000, 32768, 100001]),
       impl=st.sampled_from(["nibble", "compare"]))
def test_pallas_histogram_exact(seed, n, impl):
    """Both one-pass Pallas u8 histogram kernels (MXU joint-nibble and VPU
    compare-reduce) == np.bincount exactly, including the zero-padding
    correction on bin 0."""
    import jax.numpy as jnp
    from image_segmenter_tpu.kernels.pallas_histogram import hist256

    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, n).astype(np.uint8)
    ref = np.bincount(x, minlength=256).astype(np.float32)
    got = np.asarray(hist256(jnp.asarray(x), impl=impl))
    np.testing.assert_array_equal(got, ref)


def test_pallas_histogram_vmap_exact():
    """hist256 under vmap (the dp-sharded pipeline's shape) stays exact for
    both kernels: batching only prepends a grid dimension (no program_id or
    cross-step accumulation in either kernel body)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from image_segmenter_tpu.kernels.pallas_histogram import hist256

    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (3, 100001)).astype(np.uint8)
    ref = np.stack([np.bincount(r, minlength=256) for r in y]).astype(np.float32)
    for impl in ("nibble", "compare"):
        got = np.asarray(jax.vmap(partial(hist256, impl=impl))(jnp.asarray(y)))
        np.testing.assert_array_equal(got, ref)
