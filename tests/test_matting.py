"""Closed-form matting vs a scipy-assembled Levin Laplacian oracle."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from image_segmenter_tpu.solvers import matting as MAT
from processing.matting_refine import (
    build_trimap_from_alpha_and_strokes,
    refine_alpha_portrait,
    refine_alpha_portrait_small,
    simple_alpha_refine,
)

LAM = 100.0


def _assemble_laplacian(img, eps=1e-7, r=1, ridge_delta=1e-5):
    """Dense/sparse Levin matting Laplacian with border-clipped windows —
    the same window definition the solver uses, including the solver's
    scale-aware PSD ridge eps_w = max(eps, delta * tr(Z'Z)) (ridge_delta=0
    assembles the textbook exact-eps operator)."""
    h, w, _ = img.shape
    n = h * w
    L = sp.lil_matrix((n, n))
    I = img.reshape(-1, 3)
    for cy in range(h):
        for cx in range(w):
            ys = range(max(0, cy - r), min(h, cy + r + 1))
            xs = range(max(0, cx - r), min(w, cx + r + 1))
            idx = np.array([y * w + x for y in ys for x in xs])
            win = I[idx]
            nk = len(idx)
            mu = win.mean(axis=0)
            sigma = (win.T @ win) / nk - np.outer(mu, mu)
            eps_w = max(eps, ridge_delta * ((win - mu) ** 2).sum())
            dinv = np.linalg.inv(sigma + eps_w / nk * np.eye(3))
            dif = win - mu
            G = (1.0 + dif @ dinv @ dif.T) / nk
            for a in range(nk):
                for b in range(nk):
                    L[idx[a], idx[b]] += (1.0 if a == b else 0.0) - G[a, b]
    return L.tocsr()


@pytest.fixture(scope="module")
def small_case():
    # self-seeded: the shared session rng's state depends on test order, and
    # this test's tolerance is tight enough that the drawn case matters
    rng = np.random.default_rng(1234)
    h, w = 14, 18
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack([xx / w, yy / h, (xx + yy) / (w + h)], axis=-1)
    img += rng.normal(0, 0.02, img.shape)
    img = np.clip(img, 0, 1)
    trimap = np.full((h, w), 0.5)
    trimap[:, :3] = 0.0
    trimap[:, -3:] = 1.0
    return img, trimap


def test_matvec_matches_oracle(small_case, rng):
    img, _ = small_case
    L = _assemble_laplacian(img)
    pre = MAT._precompute(jnp.asarray(img, jnp.float32), 1e-7, 1)
    for _ in range(3):
        p = rng.normal(size=img.shape[:2]).astype(np.float32)
        ours = np.asarray(MAT._matvec(pre, jnp.asarray(p), 1))
        ref = (L @ p.reshape(-1)).reshape(img.shape[:2])
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_diag_matches_oracle(small_case):
    img, _ = small_case
    L = _assemble_laplacian(img)
    pre = MAT._precompute(jnp.asarray(img, jnp.float32), 1e-7, 1)
    np.testing.assert_allclose(np.asarray(pre.diag).reshape(-1),
                               L.diagonal(), rtol=2e-3, atol=2e-3)


def test_solution_matches_direct_solve(small_case):
    img, trimap = small_case
    L = _assemble_laplacian(img)
    n = L.shape[0]
    is_known = ((trimap < 0.1) | (trimap > 0.9)).reshape(-1)
    b = LAM * (trimap > 0.9).reshape(-1).astype(np.float64)
    A = L + sp.diags(LAM * is_known.astype(np.float64))
    ref = np.clip(spla.spsolve(A.tocsc(), b), 0, 1).reshape(trimap.shape)

    alpha, ok, it, res = MAT.solve_alpha_cf(
        jnp.asarray(img, jnp.float32), jnp.asarray(trimap, jnp.float32))
    assert bool(ok), (int(it), float(res))
    np.testing.assert_allclose(np.asarray(alpha), ref, atol=2e-2)


def test_alpha_recovery_composite(rng):
    """I = aF + (1-a)B with distinct F/B: matting recovers the gradient."""
    h, w = 24, 40
    a_true = np.tile(np.clip(np.linspace(-0.2, 1.2, w), 0, 1), (h, 1))
    F = np.array([0.9, 0.2, 0.1])
    B = np.array([0.05, 0.15, 0.8])
    img = a_true[..., None] * F + (1 - a_true[..., None]) * B
    img = np.clip(img + rng.normal(0, 0.005, img.shape), 0, 1)
    trimap = np.full((h, w), 0.5)
    trimap[a_true == 0] = 0.0
    trimap[a_true == 1] = 1.0
    alpha, ok, _, _ = MAT.solve_alpha_cf(
        jnp.asarray(img, jnp.float32), jnp.asarray(trimap, jnp.float32))
    assert bool(ok)
    assert np.abs(np.asarray(alpha) - a_true).mean() < 0.02


# ---------------------------------------------------------------------------
# trimap ladder (reference matting_refine.py:14-54)
# ---------------------------------------------------------------------------

def test_trimap_contrast_path():
    alpha = np.zeros((10, 10), np.uint8)
    alpha[:, 7:] = 255
    alpha[:, 4:7] = 128
    t = build_trimap_from_alpha_and_strokes(None, alpha, None)
    assert (t[:, 7:] == 1.0).all()
    assert (t[:, :4] == 0.0).all()
    assert (t[:, 4:7] == 0.5).all()


def test_trimap_percentile_path():
    alpha = np.full((10, 10), 100, np.uint8)
    alpha[0, :5] = 120  # range 20 <= 50 -> percentile path
    t = build_trimap_from_alpha_and_strokes(None, alpha, None)
    assert (t[0, :5] == 1.0).all()
    assert (t == 0.0).any()


def test_trimap_stroke_override_and_fallback():
    alpha = np.full((8, 8), 255, np.uint8)  # max-min = 0 -> percentile ->
    user = np.zeros((8, 8), np.uint8)       # all >= p80 -> all 1 -> bg empty
    user[0, 0] = 2
    t = build_trimap_from_alpha_and_strokes(None, alpha, user)
    assert t[0, 0] == 0.0
    assert (t == 1.0).sum() > 0


def test_simple_refine_strokes():
    alpha = np.zeros((12, 12), np.uint8)
    alpha[3:9, 3:9] = 200
    user = np.zeros((12, 12), np.uint8)
    user[0, 0] = 1
    user[11, 11] = 2
    out = simple_alpha_refine(None, alpha, user)
    assert out[0, 0] == 255 and out[11, 11] == 0
    assert out[5, 5] == 255 and out[1, 1] == 0


def test_refine_alpha_portrait_end_to_end(rng):
    """Binary-ish alpha + separable colors: refined alpha stays close."""
    h, w = 40, 60
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[...] = [20, 40, 200]
    rgb[:, 20:40] = [200, 60, 30]
    alpha = np.zeros((h, w), np.uint8)
    alpha[:, 20:40] = 255
    out = refine_alpha_portrait(rgb, alpha, None)
    assert out.shape == (h, w) and out.dtype == np.uint8
    assert (out[:, 25:35] > 200).mean() > 0.95
    assert (out[:, :15] < 50).mean() > 0.95


def test_refine_validates():
    with pytest.raises(ValueError):
        refine_alpha_portrait(np.zeros((4, 4, 4), np.uint8), np.zeros((4, 4), np.uint8), None)
    with pytest.raises(ValueError):
        refine_alpha_portrait(np.zeros((4, 4, 3), np.uint8), np.zeros((5, 5), np.uint8), None)


def test_refine_downsample_path(rng):
    """>1024 max-dim goes through AREA downsample + LINEAR upsample."""
    h, w = 80, 1100
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = [200, 50, 50]
    rgb[:, w // 2:] = [30, 30, 180]
    alpha = np.zeros((h, w), np.uint8)
    alpha[:, : w // 2] = 255
    out = refine_alpha_portrait(rgb, alpha, None)
    assert out.shape == (h, w)
    assert (out[:, : w // 4] > 200).mean() > 0.9
    assert (out[:, -w // 4 :] < 50).mean() > 0.9


def test_factored_stats_storage_equivalent(small_case):
    """half_stats=True stores the window inverses as packed LDL factors
    (24 B/px vs 36) and reconstructs dinv in the matvec — the solve must be
    numerically indistinguishable from the full-matrix path (same iteration
    count, uint8-identical alpha)."""
    img, trimap = small_case
    a_full, ok_f, it_f, _ = MAT.solve_alpha_cf(
        jnp.asarray(img, jnp.float32), jnp.asarray(trimap, jnp.float32))
    a_fact, ok_h, it_h, _ = MAT.solve_alpha_cf(
        jnp.asarray(img, jnp.float32), jnp.asarray(trimap, jnp.float32),
        half_stats=True)
    assert bool(ok_f) and bool(ok_h)
    assert abs(int(it_f) - int(it_h)) <= 2
    u8 = lambda a: (np.asarray(a) * 255 + 0.5).astype(np.uint8)
    diff = np.abs(u8(a_full).astype(int) - u8(a_fact).astype(int))
    assert diff.max() <= 1, diff.max()


def test_pathological_systems_stay_finite():
    """Flat and exactly-quantized images put p.Ap at the f32 noise floor —
    the CG breakdown machinery (deferred exact-residual restart, branchless
    since round 3) must keep the solve finite and in [0,1], not explode to
    inf as plain PCG does on these systems."""
    tri = np.full((64, 96), 0.5, np.float32)
    tri[:8] = 1.0
    tri[-8:] = 0.0
    flat = jnp.full((64, 96, 3), 0.5, jnp.float32)
    quant = np.full((64, 96, 3), 0.25, np.float32)
    quant[:, 48:] = 0.75
    for img in (flat, jnp.asarray(quant)):
        a, ok, it, res = MAT.solve_alpha_cf(img, jnp.asarray(tri),
                                            max_iter=200)
        a = np.asarray(a)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert bool(ok), (int(it), float(res))


def test_vmapped_solve_matches_per_image():
    """The CG loop is branchless specifically so the pipeline can vmap it
    (a lax.cond restart under vmap ran a second matvec per iteration, and
    per-lane select bugs would cross-contaminate lanes). A mixed batch —
    well-conditioned photo + pathological flat image — must equal the
    per-image solves bitwise."""
    rng = np.random.default_rng(3)
    imgs = np.stack([
        rng.random((64, 96, 3)).astype(np.float32),
        np.full((64, 96, 3), 0.5, np.float32),
    ])
    tri = np.full((2, 64, 96), 0.5, np.float32)
    tri[:, :8] = 1.0
    tri[:, -8:] = 0.0
    solve = lambda im, tr: MAT.solve_alpha_cf(im, tr, max_iter=120)[0]
    batched = np.asarray(jax.vmap(solve)(jnp.asarray(imgs), jnp.asarray(tri)))
    for i in range(2):
        single = np.asarray(solve(jnp.asarray(imgs[i]), jnp.asarray(tri[i])))
        np.testing.assert_array_equal(batched[i], single)
