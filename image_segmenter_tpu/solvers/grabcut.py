"""GrabCut: GMM-EM color models + grid min-cut, as jitted XLA programs.

Replaces cv2.grabCut (reference grabcut.py:52-54), whose C++ implementation
alternates (a) per-pixel GMM component assignment, (b) GMM re-estimation, and
(c) a Boykov-Kolmogorov min-cut over the 8-connected pixel lattice.

TPU-first design:
- The two 5-component full-covariance GMMs learn by blocked moment matmuls
  (same exact-f32 accumulation pattern as solvers/kmeans), with OpenCV's
  energy model: beta = 1/(2 E||ci-cj||^2) over 8-neighbor pairs, n-link
  weight gamma/dist * exp(-beta ||ci-cj||^2), gamma=50, data terms
  -log(sum_k w_k N(x; mu_k, Sigma_k)).
- The min-cut does NOT translate Boykov-Kolmogorov (pointer-chasing search
  trees are the wrong shape for a vector machine). A binary submodular grid
  MRF is equivalent to anisotropic weighted-TV minimization
      min_{u in [0,1]} sum_p a_p u_p + sum_{(p,q)} w_pq |u_p - u_q|
  whose convex relaxation is EXACT: thresholding any minimizer at 0.5 yields
  an optimal cut (coarea formula). We minimize it with a Chambolle-Pock
  primal-dual loop — per iteration a handful of shift stencils on the VPU —
  under `lax.while_loop` with an energy-gap stop. Known FG/BG pixels are
  clamped instead of carrying 9*gamma pseudo-infinite t-links.

Parity: same energy model as OpenCV, different optimizer internals (kmeans++
init seeding differs, EM local optima may differ) — acceptance is mask IoU
(tests assert >= 0.99 vs cv2.grabCut on structured scenes,
tests/test_grabcut.py; bench/grabcut_parity.json records bit-identical
energies on all 24 structured scenes), not bit equality.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from image_segmenter_tpu.solvers import kmeans as KM

GAMMA = 50.0
K_COMP = 5

# Diagnostics of the most recent grabcut_core call (read by
# bench/baseline_configs.py config 4 for stage attribution, same convention
# as solvers/matting.LAST_SOLVE_INFO).
LAST_SOLVE_INFO: dict = {}

# mask values (cv2 semantics)
BGD, FGD, PR_BGD, PR_FGD = 0, 1, 2, 3

_DIRS = [  # (dy, dx, inv_dist) — right/down/down-right/down-left covers all
    (0, 1, 1.0),
    (1, 0, 1.0),
    (1, 1, 1.0 / jnp.sqrt(2.0).item()),
    (1, -1, 1.0 / jnp.sqrt(2.0).item()),
]


def _shift(x, dy, dx, fill=0.0):
    h, w = x.shape[:2]
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    start = (max(dy, 0), max(dx, 0))
    if x.ndim == 3:
        pad = pad + ((0, 0),)
        start = start + (0,)
    xp = jnp.pad(x, pad, constant_values=fill)
    return lax.dynamic_slice(xp, start, x.shape)


# --------------------------------------------------------------------------
# GMM
# --------------------------------------------------------------------------

class GMM(NamedTuple):
    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray    # (K, 3)
    covs: jnp.ndarray     # (K, 3, 3)
    icovs: jnp.ndarray    # (K, 3, 3)
    logdets: jnp.ndarray  # (K,)


def _regularize(covs: jnp.ndarray) -> jnp.ndarray:
    """OpenCV adds 0.01 to the diagonal when the determinant underflows."""
    det = jnp.linalg.det(covs)
    eye = jnp.eye(3) * 0.01
    return jnp.where((det < 1e-6)[:, None, None], covs + eye, covs)


def _gmm_from_moments(sums, outer, counts) -> GMM:
    total = jnp.maximum(jnp.sum(counts), 1.0)
    w = counts / total
    safe = jnp.maximum(counts, 1.0)[:, None]
    means = sums / safe
    covs = outer / safe[..., None] - means[:, :, None] * means[:, None, :]
    covs = _regularize(covs)
    icovs = jnp.linalg.inv(covs)
    logdets = jnp.log(jnp.maximum(jnp.linalg.det(covs), 1e-30))
    return GMM(w, means, covs, icovs, logdets)


def _component_moments(pixels, weights_px, comp, k):
    """Blocked exact-f32 moment accumulation per component."""
    n = pixels.shape[0]
    onehot = jax.nn.one_hot(comp, k, dtype=jnp.float32) * weights_px[:, None]
    sums = jnp.einsum("nk,nd->kd", onehot, pixels,
                      precision=lax.Precision.HIGHEST)
    outer = jnp.einsum("nk,nd,ne->kde", onehot, pixels, pixels,
                       precision=lax.Precision.HIGHEST)
    counts = jnp.sum(onehot, axis=0)
    return sums, outer, counts


def _loglik(pixels, gmm: GMM) -> jnp.ndarray:
    """(N, K) log of w_k N(x; mu_k, Sigma_k)."""
    d = pixels[:, None, :] - gmm.means[None, :, :]  # (N, K, 3)
    maha = jnp.einsum("nki,kij,nkj->nk", d, gmm.icovs, d)
    log_norm = -0.5 * (maha + gmm.logdets[None, :] + 3.0 * jnp.log(2.0 * jnp.pi))
    return log_norm + jnp.log(jnp.maximum(gmm.weights, 1e-12))[None, :]


def _data_term(pixels, gmm: GMM) -> jnp.ndarray:
    """-log p(x) under the mixture. (N,)"""
    ll = _loglik(pixels, gmm)
    return -jax.nn.logsumexp(ll, axis=1)


def _assign(pixels, gmm: GMM) -> jnp.ndarray:
    return jnp.argmax(_loglik(pixels, gmm), axis=1).astype(jnp.int32)


def _init_gmm(pixels, weights_px, seed) -> GMM:
    res = KM.kmeans_fit(pixels, weights_px, K_COMP, n_init=3, max_iter=30,
                        seed=seed)
    comp = KM.assign_labels(pixels, res.centers)
    return _gmm_from_moments(*_component_moments(pixels, weights_px, comp, K_COMP))


# --------------------------------------------------------------------------
# n-link weights (OpenCV calcBeta / calcNWeights)
# --------------------------------------------------------------------------

def _nlink_weights(img: jnp.ndarray):
    """Per-direction edge weights (H, W) for the 4 canonical directions.

    beta = 1 / (2 mean ||ci - cj||^2) over all 8-neighborhood pairs
    (cv::grabcut calcBeta); weight = gamma * inv_dist * exp(-beta * d2).
    Edge (p, p+dir) stored at p; out-of-bounds edges are 0.
    """
    h, w = img.shape[:2]
    d2s = []
    valids = []
    for dy, dx, _ in _DIRS:
        nb = _shift(img, dy, dx)
        d2 = jnp.sum((img - nb) ** 2, axis=-1)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        valid = ((ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w))
        d2s.append(jnp.where(valid, d2, 0.0))
        valids.append(valid)
    total_d2 = sum(jnp.sum(d) for d in d2s)
    total_n = sum(jnp.sum(v) for v in valids)
    beta = jnp.where(total_d2 > 1e-12, total_n / (2.0 * total_d2), 0.0)
    weights = []
    for (dy, dx, inv_dist), d2, valid in zip(_DIRS, d2s, valids):
        wgt = GAMMA * inv_dist * jnp.exp(-beta * d2)
        weights.append(jnp.where(valid, wgt, 0.0))
    return weights


# --------------------------------------------------------------------------
# min-cut via Chambolle-Pock anisotropic weighted TV
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iter",))
def tv_mincut(unary: jnp.ndarray, edge_weights, fixed_fg: jnp.ndarray,
              fixed_bg: jnp.ndarray, max_iter: int = 2000,
              warm_y: jnp.ndarray | None = None):
    """min_{u in [0,1]} sum a_p u_p + sum w_pq |u_p - u_q|, u clamped on
    fixed pixels. a_p = D_fg(p) - D_bg(p) (positive pushes to BG=0).

    Returns (u, iters, y) — threshold u at 0.5 for the cut. Primal-dual with
    diagonal preconditioning (Pock & Chambolle 2011) for robust steps under
    wildly varying edge weights. Pass warm_y (the previous GrabCut
    iteration's dual state) to resume instead of starting cold: the cut
    moves little between EM iterations, and warm DUALS are what closes the
    0.95 -> 0.999 IoU-vs-cv2 gap on real photos (bench/grabcut_parity);
    the primal restarts from the new unary's sign each alternation (warm
    primal starts were measured to add nothing once the duals carry).
    """
    h, w = unary.shape
    n_dir = len(edge_weights)
    wts = jnp.stack(edge_weights)  # (D, H, W)

    # Diagonal preconditioning (Pock & Chambolle 2011) for the unweighted
    # difference operator K (weights live in the dual projection): each edge
    # row sums to 2 -> sigma = 1/2; each pixel column sums to its incident
    # edge count -> tau_p = 1/deg_p.
    deg = jnp.zeros((h, w), jnp.float32)
    for i, (dy, dx, _) in enumerate(_DIRS):
        has_e = (wts[i] > 0).astype(jnp.float32)
        deg = deg + has_e + _shift(has_e, -dy, -dx)
    tau = 1.0 / jnp.maximum(deg, 1.0)
    sigma = 0.5

    def clamp(u):
        u = jnp.where(fixed_fg, 1.0, u)
        u = jnp.where(fixed_bg, 0.0, u)
        return jnp.clip(u, 0.0, 1.0)

    u0 = clamp(jnp.where(unary <= 0, 1.0, 0.0))
    if warm_y is None:
        y0 = jnp.zeros((n_dir, h, w), jnp.float32)
    else:
        # project the carried dual into the new weights' feasible box
        y0 = jnp.clip(warm_y, -wts, wts)

    def body(state):
        u, ubar, y, it, _ = state
        # dual ascent: y_e <- proj_{|y|<=w} (y + sigma * (ubar_p - ubar_q))
        new_y = []
        div = jnp.zeros((h, w), jnp.float32)
        for i, (dy, dx, _) in enumerate(_DIRS):
            g = ubar - _shift(ubar, dy, dx)
            yi = jnp.clip(y[i] + sigma * g, -wts[i], wts[i])
            new_y.append(yi)
            div = div + yi - _shift(yi, -dy, -dx)
        y = jnp.stack(new_y)
        u_new = clamp(u - tau * (unary + div))
        ubar = 2.0 * u_new - u
        return u_new, ubar, y, it + 1, jnp.max(jnp.abs(u_new - u))

    def cond(state):
        _, _, _, it, delta = state
        return (it < max_iter) & ((delta > 2e-5) | (it < 50))

    u, _, y, it, _ = lax.while_loop(
        cond, body, (u0, u0, y0, jnp.int32(0), jnp.float32(jnp.inf)))
    return u, it, y


# --------------------------------------------------------------------------
# full GrabCut loop
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("seed",))
def _grabcut_init(img_bgr: jnp.ndarray, init_mask: jnp.ndarray, seed: int = 42):
    img = img_bgr.astype(jnp.float32)
    pixels = img.reshape(-1, 3)
    mask0 = init_mask.astype(jnp.int32)
    fg_w0 = ((mask0 == FGD) | (mask0 == PR_FGD)).reshape(-1).astype(jnp.float32)
    fg_gmm0 = _init_gmm(pixels, fg_w0, seed)
    bg_gmm0 = _init_gmm(pixels, 1.0 - fg_w0, seed + 1)
    return fg_gmm0, bg_gmm0


def _grabcut_iter_impl(img_bgr: jnp.ndarray, mask: jnp.ndarray, fg_gmm: GMM,
                       bg_gmm: GMM, cut_y=None, cut_iters: int = 2500):
    """One assign/learn/cut alternation (compiled once, run `iterations`x).

    cut_y carries the TV dual state between alternations so each cut
    resumes where the last converged to (the GMMs, hence the unary, move
    slowly after the first pass)."""
    h, w = img_bgr.shape[:2]
    img = img_bgr.astype(jnp.float32)
    pixels = img.reshape(-1, 3)
    mask = mask.astype(jnp.int32)
    known_fg = mask == FGD
    known_bg = mask == BGD
    edge_w = _nlink_weights(img)

    is_fg = ((mask == FGD) | (mask == PR_FGD)).reshape(-1)
    fg_w = is_fg.astype(jnp.float32)
    bg_w = 1.0 - fg_w

    fg_comp = _assign(pixels, fg_gmm)
    bg_comp = _assign(pixels, bg_gmm)
    fg_gmm = _gmm_from_moments(*_component_moments(pixels, fg_w, fg_comp, K_COMP))
    bg_gmm = _gmm_from_moments(*_component_moments(pixels, bg_w, bg_comp, K_COMP))

    # unary = D_fg - D_bg: u=1 means FG, so FG assignment pays D_fg (-log p_fg)
    d_fg = _data_term(pixels, fg_gmm).reshape(h, w)
    d_bg = _data_term(pixels, bg_gmm).reshape(h, w)
    unary = d_fg - d_bg
    u, it, y = tv_mincut(unary, edge_w, known_fg, known_bg,
                         max_iter=cut_iters, warm_y=cut_y)
    fg_side = u > 0.5
    new_mask = jnp.where(
        (mask == PR_BGD) | (mask == PR_FGD),
        jnp.where(fg_side, PR_FGD, PR_BGD),
        mask,
    )
    return new_mask.astype(jnp.uint8), fg_gmm, bg_gmm, y, it


_grabcut_iter = functools.partial(jax.jit, static_argnames=("cut_iters",))(
    _grabcut_iter_impl)
# one batched-candidate alternation, compiled once per shape (the image and
# its n-link weights are lane-invariant: vmap leaves them unbatched)
_grabcut_iter_batched = jax.jit(jax.vmap(
    _grabcut_iter_impl, in_axes=(None, 0, 0, 0, 0)))


# --------------------------------------------------------------------------
# standardized mask energy + split-merge polish
# --------------------------------------------------------------------------

def _mask_energy_impl(img_bgr: jnp.ndarray, fg01: jnp.ndarray) -> jnp.ndarray:
    """GrabCut energy of a hard segmentation under GMMs fit to its own
    partition by a FIXED protocol (kmeans-seeded EM refit, seed 42) — the
    common evaluator bench/grabcut_parity.py scores both cv2 and us with.
    Scoring candidate masks with the algorithm's own GMM likelihoods
    instead is invalid: overfit tiny-covariance components make a worse
    mask look better (measured on the working-image scene)."""
    img = img_bgr.astype(jnp.float32)
    pixels = img.reshape(-1, 3)
    fw = fg01.reshape(-1).astype(jnp.float32)

    def side_nll(wts):
        gmm0 = _init_gmm(pixels, wts, 42)
        comp = _assign(pixels, gmm0)
        gmm = _gmm_from_moments(
            *_component_moments(pixels, wts, comp, K_COMP))
        return _data_term(pixels, gmm)

    data = jnp.sum(jnp.where(fw > 0, side_nll(fw), side_nll(1.0 - fw)))
    u = fw.reshape(img.shape[:2])
    smooth = jnp.float32(0.0)
    for (dy, dx, _), wd in zip(_DIRS, _nlink_weights(img)):
        smooth = smooth + jnp.sum(wd * jnp.abs(u - _shift(u, dy, dx)))
    return data + smooth


mask_energy = jax.jit(_mask_energy_impl)
_mask_energy_batched = jax.jit(jax.vmap(_mask_energy_impl, in_axes=(None, 0)))


def _split_gmm_impl(img_bgr: jnp.ndarray, side_w01: jnp.ndarray, gmm: GMM,
                    s: jnp.ndarray) -> GMM:
    """Candidate GMM: split component s in two (weighted 2-means seeded on
    the diagonal-covariance axis) and merge the closest remaining pair.

    EM from a kmeans init is a fixed point that can starve a small,
    tightly-colored pixel population of its own component (quantized
    images: the measured working-image scene blurs sparse greens into a
    dark component and pays 4.7% extra energy for it). A split-merge
    proposal is the standard escape move; acceptance is by mask_energy."""
    pixels = img_bgr.astype(jnp.float32).reshape(-1, 3)
    comp = _assign(pixels, gmm)
    mw = side_w01 * (comp == s).astype(jnp.float32)
    msum = jnp.maximum(jnp.sum(mw), 1e-6)
    mean = (mw @ pixels) / msum
    var = (mw @ (pixels - mean) ** 2) / msum
    delta = jnp.sqrt(jnp.maximum(var, 1e-4))
    c0 = jnp.stack([mean - delta, mean + delta])

    def lloyd(_, c):
        d2 = jnp.sum((pixels[:, None, :] - c[None]) ** 2, axis=-1)
        a = jnp.argmin(d2, axis=1)
        oh = jax.nn.one_hot(a, 2, dtype=jnp.float32) * mw[:, None]
        cnt = jnp.sum(oh, axis=0)
        newc = (oh.T @ pixels) / jnp.maximum(cnt, 1e-6)[:, None]
        return jnp.where((cnt > 0)[:, None], newc, c)

    c = lax.fori_loop(0, 12, lloyd, c0)

    means = gmm.means
    oh_all = jax.nn.one_hot(comp, K_COMP, dtype=jnp.float32) * side_w01[:, None]
    cnts = jnp.sum(oh_all, axis=0)
    ii = jnp.arange(K_COMP)
    d2p = jnp.sum((means[:, None] - means[None]) ** 2, axis=-1)
    valid = (ii[:, None] < ii[None, :]) & (ii[:, None] != s) & (ii[None, :] != s)
    idx = jnp.argmin(jnp.where(valid, d2p, jnp.inf))
    i, j = idx // K_COMP, idx % K_COMP
    merged = ((cnts[i] * means[i] + cnts[j] * means[j])
              / jnp.maximum(cnts[i] + cnts[j], 1e-6))
    new_means = means.at[s].set(c[0]).at[i].set(merged).at[j].set(c[1])
    comp_new = KM.assign_labels(pixels, new_means)
    return _gmm_from_moments(
        *_component_moments(pixels, side_w01, comp_new, K_COMP))


_split_candidates = jax.jit(jax.vmap(
    _split_gmm_impl, in_axes=(None, None, None, 0)))


def _fg_of(m):
    return ((m == FGD) | (m == PR_FGD)).astype(jnp.float32)


def _accepts(e_cand: float, e_inc: float) -> bool:
    # strict-improvement margin keeps the converged mask on ties (and
    # keeps scenes where EM already found the optimum bit-stable)
    return e_cand < e_inc - 1e-6 * abs(e_inc) - 1e-3


def _accepts_dev(e_cand, e_inc):
    """Device-scalar twin of `_accepts` — the polish keeps its accept/carry
    decisions on device (jnp.where) so the whole polish enqueues without a
    host sync per round: through the axon tunnel each sync costs a ~60 ms
    round trip, and the r4 polish paid ~9 of them, making the interactive
    grabcut path dispatch-bound (t_polish 0.77 s vs t_em 0.10 s measured,
    bench/baseline_configs config 4)."""
    return e_cand < e_inc - 1e-6 * jnp.abs(e_inc) - 1e-3


def _where_tree(pred, a, b):
    return jax.tree.map(lambda x, z: jnp.where(pred, x, z), a, b)


def _polish_round(img_bgr, mask, fg_gmm, bg_gmm, y, extra_iters: int):
    """One split-merge proposal round: build 2K candidate GMM pairs (split
    each FG and each BG component), continue each for `extra_iters` batched
    alternations, rank with the vmapped evaluator, and CONFIRM the best one
    with the unbatched mask_energy — the exact judge the parity artifact
    scores with. Confirmation matters: the kmeans-seeded refit inside the
    evaluator is tie-break sensitive, so the vmapped and unbatched scores
    can disagree by a few units on ~2e4 energies (measured: the batched
    score accepted a mask the unbatched judge rejects on the orange_bright
    corpus scene). Returns (mask, fg_gmm, bg_gmm, y, e) of the best
    candidate (unconfirmed — caller compares e against the incumbent).
    Everything stays on device (argmin + gather, no host sync) so callers
    can enqueue multiple rounds back-to-back."""
    fg01 = _fg_of(mask).reshape(-1)
    s_ids = jnp.arange(K_COMP)
    fg_splits = _split_candidates(img_bgr, fg01, fg_gmm, s_ids)
    bg_splits = _split_candidates(img_bgr, 1.0 - fg01, bg_gmm, s_ids)

    def bcast(g: GMM) -> GMM:
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (K_COMP,) + a.shape), g)

    cat = lambda a, b: jax.tree.map(  # noqa: E731
        lambda x, z: jnp.concatenate([x, z]), a, b)
    fgg = cat(fg_splits, bcast(fg_gmm))
    bgg = cat(bcast(bg_gmm), bg_splits)
    n_cand = 2 * K_COMP
    masks = jnp.broadcast_to(mask, (n_cand,) + mask.shape)
    ys = jnp.broadcast_to(y, (n_cand,) + y.shape)
    for _ in range(extra_iters):
        masks, fgg, bgg, ys, _ = _grabcut_iter_batched(
            img_bgr, masks, fgg, bgg, ys)

    es = _mask_energy_batched(img_bgr, _fg_of(masks))
    es = jnp.where(jnp.isnan(es), jnp.inf, es)
    k = jnp.argmin(es)
    e_cand = mask_energy(img_bgr, _fg_of(masks[k]))
    return (masks[k], jax.tree.map(lambda a: a[k], fgg),
            jax.tree.map(lambda a: a[k], bgg), ys[k], e_cand)


def _splitmerge_polish(img_bgr, mask, fg_gmm, bg_gmm, y,
                       extra_iters: int = 3, rounds: int = 3,
                       search_max_dim: int | None = None):
    """Iterated split-merge proposals after EM converges.

    Accepted rounds carry the winning lane's OWN GMM/dual state into the
    next round — re-fitting GMMs from the accepted mask can fall back into
    a far worse EM basin (measured: 11527 -> 24427 on the quantized
    working image).

    Above `search_max_dim` (default config.Defaults.grabcut_polish_search_dim)
    the CANDIDATE SEARCH runs on an AREA-downscaled image: split-merge
    candidates live in color space, so the coarse image finds the same
    starved-population escapes at ~(dim/max_dim)^2 of the cost; only the
    winning GMM pair is then continued for `extra_iters` alternations at
    full resolution and accepted iff the full-resolution mask_energy
    strictly improves — acceptance is always exact, only the proposal
    search is approximate.

    Dispatch discipline: all accept/carry decisions are device-side
    selects (`_accepts_dev` + jnp.where), so the whole polish enqueues
    with at most TWO host syncs — the exact round-1-reject early exit
    (a rejected round leaves the carried state unchanged, so later rounds
    would deterministically re-propose and re-reject the same candidates)
    and the any-round-accepted gate deciding whether to pay the full-res
    continuation. Outcome-identical to the old per-round early-break,
    which paid ~9 ~60 ms tunnel round trips per solve (r4 attribution:
    t_polish 0.77 s vs t_em 0.10 s — dispatch-bound)."""
    if search_max_dim is None:
        from image_segmenter_tpu.config import DEFAULTS

        search_max_dim = DEFAULTS.grabcut_polish_search_dim

    h, w = mask.shape

    if max(h, w) <= int(search_max_dim):
        e_inc = mask_energy(img_bgr, _fg_of(mask))
        for r in range(int(rounds)):
            m_c, fg_c, bg_c, y_c, e_c = _polish_round(
                img_bgr, mask, fg_gmm, bg_gmm, y, extra_iters)
            acc = _accepts_dev(e_c, e_inc)
            mask = jnp.where(acc, m_c, mask)
            fg_gmm = _where_tree(acc, fg_c, fg_gmm)
            bg_gmm = _where_tree(acc, bg_c, bg_gmm)
            y = jnp.where(acc, y_c, y)
            e_inc = jnp.where(acc, e_c, e_inc)
            # EXACT early exit, one sync: a rejected round leaves the state
            # unchanged, so every later round re-proposes and re-rejects
            # the same candidates — checking only after round 1 catches the
            # common already-converged case without a per-round sync.
            if r == 0 and not bool(acc):
                return mask
        return mask

    # coarse search, full-res acceptance
    from image_segmenter_tpu.ops import resize as RZ

    nh, nw = RZ.scale_to_max_dim(h, w, int(search_max_dim))
    img_s = RZ.resize_u8(img_bgr, (nh, nw), RZ.AREA)
    mask_s = RZ.resize_u8(mask, (nh, nw), RZ.NEAREST_CV)
    # settle the coarse state (one alternation builds the coarse dual y)
    mask_s, fg_s, bg_s, y_s, _ = _grabcut_iter(img_s, mask_s, fg_gmm, bg_gmm,
                                               None)
    e_s = mask_energy(img_s, _fg_of(mask_s))
    any_acc = jnp.bool_(False)
    for r in range(int(rounds)):
        m_c, fg_c, bg_c, y_c, e_c = _polish_round(
            img_s, mask_s, fg_s, bg_s, y_s, extra_iters)
        acc = _accepts_dev(e_c, e_s)
        mask_s = jnp.where(acc, m_c, mask_s)
        fg_s = _where_tree(acc, fg_c, fg_s)
        bg_s = _where_tree(acc, bg_c, bg_s)
        y_s = jnp.where(acc, y_c, y_s)
        e_s = jnp.where(acc, e_c, e_s)
        any_acc = any_acc | acc
        # EXACT early exit (see the small-path note): a round-1 reject
        # means every later round re-rejects identical candidates; one
        # sync here skips two full candidate rounds AND the full-res
        # continuation in the common already-converged case.
        if r == 0 and not bool(acc):
            return mask

    # second host sync: skip the full-res continuation (and its two
    # full-res evaluator refits) when no coarse round improved
    if not bool(any_acc):
        return mask  # full-res energies never computed on the reject path

    m_f, fg_f, bg_f, y_f = mask, fg_s, bg_s, y
    for _ in range(int(extra_iters)):
        m_f, fg_f, bg_f, y_f, _ = _grabcut_iter(img_bgr, m_f, fg_f, bg_f,
                                                y_f)
    e_inc = mask_energy(img_bgr, _fg_of(mask))
    e_f = mask_energy(img_bgr, _fg_of(m_f))
    return jnp.where(_accepts_dev(e_f, e_inc), m_f, mask)


def _anchor_core(init_mask_np) -> "np.ndarray | None":
    """Central core of the init-FG bounding box, restricted to unknown
    pixels — the region the collapse restart temporarily clamps to hard FG.
    Pure init-mask geometry (image-content independent, deterministic).
    Returns a bool (H, W) array or None when no usable anchor exists."""
    import numpy as np

    m = np.asarray(init_mask_np)
    fg_init = (m == FGD) | (m == PR_FGD)
    unknown = (m == PR_BGD) | (m == PR_FGD)
    ys, xs = np.nonzero(fg_init)
    if ys.size == 0:
        return None
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    dy, dx = (y1 - y0) // 4, (x1 - x0) // 4
    anchor = np.zeros(m.shape, bool)
    anchor[y0 + dy:y1 - dy, x0 + dx:x1 - dx] = True
    anchor &= unknown & fg_init
    return anchor if anchor.any() else None


def _run_alternations(img_bgr, mask, fg_gmm, bg_gmm, y, iterations: int):
    """`iterations` assign/learn/cut alternations, enqueued back-to-back
    (async dispatch — no host sync per iteration). Returns the final state
    plus the per-alternation TV-cut iteration counts (device scalars)."""
    cut_iters = []
    for _ in range(int(iterations)):
        mask, fg_gmm, bg_gmm, y, it = _grabcut_iter(
            img_bgr, mask, fg_gmm, bg_gmm, y)
        cut_iters.append(it)
    return mask, fg_gmm, bg_gmm, y, cut_iters


def grabcut_core(img_bgr: jnp.ndarray, init_mask: jnp.ndarray,
                 iterations: int = 10, seed: int = 42,
                 splitmerge: bool | None = None):
    """Run GrabCut. img_bgr (H, W, 3) uint8; init_mask (H, W) uint8 {0,1,2,3}.

    Returns the refined mask (uint8 {0,1,2,3}): unknown pixels become
    PR_FGD/PR_BGD by the cut, known pixels pass through. The iteration loop
    runs on the host over a per-iteration compiled body — one small program
    compiled once beats one giant scan-of-while-loops program (remote
    compile time dominates on tunneled TPU deployments).

    splitmerge (default config.Defaults.grabcut_splitmerge): after the EM
    alternations converge, propose split-merge moves on both GMMs and keep
    the best mask under the standardized energy — an optimizer improvement
    over cv.grabCut (reference grabcut.py:52-54), which has no escape from
    EM local optima; cv2's own mask on the quantized working-image scene
    varies RNG-state-to-RNG-state between energy 11564 and 24262 (a 2.1x
    spread) where this path lands below its best observed basin.
    """
    import time as _time

    import numpy as np

    from image_segmenter_tpu.config import DEFAULTS

    if splitmerge is None:
        splitmerge = DEFAULTS.grabcut_splitmerge
    LAST_SOLVE_INFO.clear()
    LAST_SOLVE_INFO["h2d_bytes"] = int(img_bgr.size) + int(init_mask.size)
    t0 = _time.perf_counter()
    fg_gmm0, bg_gmm0 = _grabcut_init(img_bgr, init_mask, seed=seed)
    jax.block_until_ready(fg_gmm0.means)
    LAST_SOLVE_INFO["t_init"] = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    mask, fg_gmm, bg_gmm, y, cut_its = _run_alternations(
        img_bgr, init_mask, fg_gmm0, bg_gmm0, None, iterations)
    mask_np = np.asarray(mask)  # one D2H sync fences the async EM chain
    LAST_SOLVE_INFO.update(
        t_em=_time.perf_counter() - t0,
        em_iters=int(iterations),
        cut_iters=[int(i) for i in np.asarray(jnp.stack(cut_its))]
        if cut_its else [])

    # Collapse restart (config.Defaults.grabcut_collapse_restart): when the
    # cut leaves (almost) no unknown pixel in the foreground, all-BG was an
    # absorbing EM state, not a discovered optimum — rerun with a core of
    # the init-FG region clamped to hard FG so the GMMs specialize, release,
    # and keep the standardized-energy winner (the same judge the parity
    # sweep and the split-merge polish use).
    if DEFAULTS.grabcut_collapse_restart and int(iterations) > 0:
        init_np = np.asarray(init_mask)
        unknown = (init_np == PR_BGD) | (init_np == PR_FGD)
        fg_u = ((mask_np == FGD) | (mask_np == PR_FGD)) & unknown
        n_unknown = max(int(unknown.sum()), 1)
        collapsed = fg_u.sum() < max(0.005 * n_unknown, 1)
        anchor = _anchor_core(init_np) if collapsed else None
        if anchor is not None:
            t0 = _time.perf_counter()
            m_anchor = init_np.copy()
            m_anchor[anchor] = FGD
            m_r, fg_r, bg_r, y_r, _ = _run_alternations(
                img_bgr, jnp.asarray(m_anchor), fg_gmm0, bg_gmm0, None,
                iterations)
            # release the clamp: anchor pixels become probable again and the
            # cut settles under the specialized GMMs (warm duals carried)
            m_r = jnp.where(jnp.asarray(anchor), jnp.uint8(PR_FGD), m_r)
            m_r, fg_r, bg_r, y_r, _ = _run_alternations(
                img_bgr, m_r, fg_r, bg_r, y_r, 3)
            e_primary = float(mask_energy(img_bgr, _fg_of(mask)))
            e_restart = float(mask_energy(img_bgr, _fg_of(m_r)))
            restarted = _accepts(e_restart, e_primary)
            if restarted:
                mask, fg_gmm, bg_gmm, y = m_r, fg_r, bg_r, y_r
            LAST_SOLVE_INFO.update(
                t_restart=_time.perf_counter() - t0,
                restart_accepted=bool(restarted))
    if splitmerge and int(iterations) > 0:
        t0 = _time.perf_counter()
        mask = _splitmerge_polish(img_bgr, mask, fg_gmm, bg_gmm, y)
        jax.block_until_ready(mask)
        LAST_SOLVE_INFO["t_polish"] = _time.perf_counter() - t0
    return mask
