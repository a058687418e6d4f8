"""GrabCut vs cv2.grabCut oracle (IoU acceptance, not bit equality)."""

import cv2 as cv
import numpy as np
import pytest

from processing.grabcut import apply_grabcut


def _scene(rng, h=72, w=96):
    """FG blob with distinct color stats on a textured background."""
    img = np.zeros((h, w, 3), np.float64)
    img[...] = [40, 90, 160]  # bgr background
    img += rng.normal(0, 12, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - h / 2) ** 2 / (h / 3.2) ** 2 + (xx - w / 2) ** 2 / (w / 3.5) ** 2) < 1
    fg = np.array([180, 120, 50], np.uint8)
    img[blob] = fg
    img[blob] = np.clip(img[blob].astype(int) + rng.normal(0, 12, (blob.sum(), 3)), 0, 255)
    return np.clip(img, 0, 255).astype(np.uint8), blob


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_rect_init_vs_cv2(rng):
    img, blob = _scene(rng)
    h, w = img.shape[:2]
    rect = (8, 8, w - 16, h - 16)

    ours = apply_grabcut(img, rect_xywh=rect, iterations=10)
    fg_ours = (ours == 1) | (ours == 3)

    ref_mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv.grabCut(img, ref_mask, rect, bgd, fgd, 10, cv.GC_INIT_WITH_RECT)
    fg_ref = (ref_mask == 1) | (ref_mask == 3)

    assert _iou(fg_ours, fg_ref) >= 0.99, _iou(fg_ours, fg_ref)
    assert _iou(fg_ours, blob) > 0.9


def test_mask_init_vs_cv2(rng):
    img, blob = _scene(rng)
    h, w = img.shape[:2]
    init = np.full((h, w), 2, np.uint8)       # PR_BGD everywhere
    init[blob] = 3                            # PR_FGD on blob-ish area
    init[:4, :] = 0                           # known BG border
    cy, cx = h // 2, w // 2
    init[cy - 3 : cy + 3, cx - 3 : cx + 3] = 1  # known FG seed

    ours = apply_grabcut(img, init_mask=init, iterations=10)
    fg_ours = (ours == 1) | (ours == 3)

    ref_mask = init.copy()
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv.grabCut(img, ref_mask, None, bgd, fgd, 10, cv.GC_INIT_WITH_MASK)
    fg_ref = (ref_mask == 1) | (ref_mask == 3)

    assert _iou(fg_ours, fg_ref) >= 0.99, _iou(fg_ours, fg_ref)
    # known pixels pass through untouched
    assert (ours[:4, :] == 0).all()
    assert (ours[cy - 3 : cy + 3, cx - 3 : cx + 3] == 1).all()


def test_validates():
    with pytest.raises(ValueError):
        apply_grabcut(np.zeros((4, 4, 4), np.uint8), rect_xywh=(0, 0, 2, 2))
    with pytest.raises(ValueError):
        apply_grabcut(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        apply_grabcut(np.zeros((4, 4, 3), np.uint8),
                      init_mask=np.zeros((5, 5), np.uint8))


def test_mincut_exactness(rng):
    """The TV relaxation must land on the exact discrete cut of a tiny MRF
    (verified by vectorized brute force over all 2^(h*w) labelings)."""
    import jax.numpy as jnp
    from image_segmenter_tpu.solvers.grabcut import tv_mincut, _DIRS

    h, w = 4, 4
    n = h * w
    unary = rng.normal(0, 2, (h, w)).astype(np.float32)
    wts = []
    edges = []  # (p, q, weight)
    ys, xs = np.mgrid[0:h, 0:w]
    for dy, dx, _ in _DIRS:
        wt = np.abs(rng.normal(0.5, 0.5, (h, w))).astype(np.float32)
        valid = (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)
        wt = np.where(valid, wt, 0.0).astype(np.float32)
        wts.append(wt)
        for y, x in zip(*np.nonzero(valid)):
            edges.append((y * w + x, (y + dy) * w + (x + dx), wt[y, x]))

    configs = ((np.arange(1 << n)[:, None] >> np.arange(n)) & 1).astype(np.float32)
    energies = configs @ unary.reshape(-1)
    for p, q, wgt in edges:
        energies += wgt * np.abs(configs[:, p] - configs[:, q])
    best_energy = energies.min()

    u, _, _ = tv_mincut(jnp.asarray(unary), [jnp.asarray(x) for x in wts],
                        jnp.zeros((h, w), bool), jnp.zeros((h, w), bool),
                        max_iter=5000)
    got = (np.asarray(u) > 0.5).astype(np.float32).reshape(-1)
    e_got = float(got @ unary.reshape(-1)
                  + sum(wgt * abs(got[p] - got[q]) for p, q, wgt in edges))
    assert e_got <= best_energy + 1e-3, (e_got, best_energy)


def test_splitmerge_coarse_search_accept_guard(rng):
    """Above grabcut_polish_search_dim the polish searches on a downscaled
    image but ACCEPTS by full-resolution energy: the polished mask's
    standardized energy is never worse than the plain alternation's, and
    known pixels still pass through."""
    import jax.numpy as jnp
    from image_segmenter_tpu.solvers import grabcut as GC

    img, blob = _scene(rng, h=120, w=160)
    h, w = img.shape[:2]
    init = np.full((h, w), GC.BGD, np.uint8)
    init[10:h - 10, 10:w - 10] = GC.PR_FGD
    imgj, initj = jnp.asarray(img), jnp.asarray(init)

    plain = np.asarray(GC.grabcut_core(imgj, initj, iterations=5,
                                       splitmerge=False))
    fg_gmm, bg_gmm = GC._grabcut_init(imgj, initj, seed=42)
    mask, y = initj, None
    for _ in range(5):
        mask, fg_gmm, bg_gmm, y, _ = GC._grabcut_iter(imgj, mask, fg_gmm,
                                                      bg_gmm, y)
    assert (np.asarray(mask) == plain).all()
    # force the coarse path (120x160 > 64) with a tiny search budget
    pol = np.asarray(GC._splitmerge_polish(imgj, mask, fg_gmm, bg_gmm, y,
                                           extra_iters=1, rounds=1,
                                           search_max_dim=64))

    def energy(m):
        fg = ((m == GC.FGD) | (m == GC.PR_FGD)).astype(np.float32)
        return float(GC.mask_energy(imgj, jnp.asarray(fg)))

    assert energy(pol) <= energy(plain) + 1e-3
    assert (pol[:10, :] == GC.BGD).all()  # known pixels pass through
    assert set(np.unique(pol).tolist()) <= {0, 1, 2, 3}
