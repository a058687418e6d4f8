"""k-means solver vs sklearn oracle."""

import numpy as np
import jax.numpy as jnp
from sklearn.cluster import KMeans

from image_segmenter_tpu.solvers import kmeans as KM


def _blobs(rng, k=5, n=3000, d=3, spread=8.0, sep=80.0):
    centers = rng.uniform(0, 255, size=(k, d))
    # push centers apart
    for _ in range(20):
        for i in range(k):
            for j in range(k):
                if i != j and np.linalg.norm(centers[i] - centers[j]) < sep:
                    centers[i] += rng.normal(0, 20, d)
        centers = np.clip(centers, 0, 255)
    labels = rng.integers(0, k, size=n)
    pts = centers[labels] + rng.normal(0, spread, size=(n, d))
    return np.clip(pts, 0, 255).astype(np.float32), centers


def _match_centers(a, b):
    """Greedy bipartite match; returns mean matched distance."""
    from scipy.optimize import linear_sum_assignment

    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    ri, ci = linear_sum_assignment(d)
    return d[ri, ci].mean()


def test_recovers_separated_clusters(rng):
    pts, true_centers = _blobs(rng, k=5)
    res = KM.kmeans_fit(jnp.asarray(pts), jnp.ones((len(pts),), jnp.float32), 5)
    got = np.asarray(res.centers)
    assert _match_centers(got, true_centers) < 3.0


def test_inertia_close_to_sklearn(rng):
    pts, _ = _blobs(rng, k=6, n=4000, spread=25.0, sep=40.0)
    res = KM.kmeans_fit(jnp.asarray(pts), jnp.ones((len(pts),), jnp.float32), 6)
    sk = KMeans(n_clusters=6, random_state=42, n_init=10).fit(pts)
    ours = float(res.inertia)
    theirs = float(sk.inertia_)
    assert ours <= theirs * 1.02, (ours, theirs)


def test_weights_exclude_points(rng):
    pts, true_centers = _blobs(rng, k=3, n=1500)
    # add junk points with weight 0
    junk = rng.uniform(0, 255, size=(500, 3)).astype(np.float32)
    allp = np.concatenate([pts, junk])
    w = np.concatenate([np.ones(len(pts)), np.zeros(len(junk))]).astype(np.float32)
    res = KM.kmeans_fit(jnp.asarray(allp), jnp.asarray(w), 3)
    assert _match_centers(np.asarray(res.centers), true_centers) < 3.0


def test_assign_labels(rng):
    pts, _ = _blobs(rng, k=4, n=1000)
    centers = pts[:4]
    lbl = np.asarray(KM.assign_labels(jnp.asarray(pts), jnp.asarray(centers)))
    d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
    ref = d.argmin(axis=1)
    # ties can differ; require near-total agreement
    assert (lbl == ref).mean() > 0.999


def test_weighted_equals_repeated(rng):
    """Weighted fit over unique points == unweighted fit over repeats."""
    uniq = rng.uniform(0, 255, size=(50, 3)).astype(np.float32)
    counts = rng.integers(1, 20, size=50)
    repeated = np.repeat(uniq, counts, axis=0)
    r1 = KM.kmeans_fit(jnp.asarray(uniq), jnp.asarray(counts.astype(np.float32)), 4)
    r2 = KM.kmeans_fit(jnp.asarray(repeated), jnp.ones((len(repeated),), jnp.float32), 4)
    # Different point orders -> different kmeans++ draws; compare inertia only.
    assert abs(float(r1.inertia) - float(r2.inertia)) / float(r2.inertia) < 0.05


def test_batched_restarts_match_sequential(rng):
    """kmeans_fit(batch_restarts=True) runs all n_init restarts as ONE
    lock-step Lloyd (solvers/kmeans._lloyd_batched); each restart's
    trajectory must be identical to its sequential run (per-column matmul
    results don't depend on the other columns), so the selected winner is
    bit-for-bit the sequential one."""
    for n, k, n_init in ((3000, 5, 10), (700, 4, 3)):
        pts, _ = _blobs(rng, k=k, n=n, spread=20.0, sep=50.0)
        w = (rng.random(n) > 0.1).astype(np.float32)
        seq = KM.kmeans_fit(jnp.asarray(pts), jnp.asarray(w), k,
                            n_init=n_init, batch_restarts=False)
        bat = KM.kmeans_fit(jnp.asarray(pts), jnp.asarray(w), k,
                            n_init=n_init, batch_restarts=True)
        assert np.array_equal(np.asarray(seq.centers), np.asarray(bat.centers))
        assert float(seq.inertia) == float(bat.inertia)


def test_det_fit_recovers_clusters_and_is_deterministic(rng):
    pts, true_centers = _blobs(rng, k=5)
    w = jnp.ones((len(pts),), jnp.float32)
    r1 = KM.kmeans_fit_det(jnp.asarray(pts), w, 5)
    r2 = KM.kmeans_fit_det(jnp.asarray(pts), w, 5)
    assert np.array_equal(np.asarray(r1.centers), np.asarray(r2.centers))
    assert _match_centers(np.asarray(r1.centers), true_centers) < 3.0


def test_det_fit_quality_near_sampled(rng):
    """The deterministic fit must stay within 1.3x of the 2-restart sampled
    kmeans++ inertia on messy overlapping blobs (corpus gate measured worst
    1.13 / mean 1.03 over 15 photo samples; this is the in-tree floor)."""
    pts, _ = _blobs(rng, k=6, n=4000, spread=25.0, sep=40.0)
    w = jnp.ones((len(pts),), jnp.float32)
    det = KM.kmeans_fit_det(jnp.asarray(pts), w, 6)
    pp2 = KM.kmeans_fit(jnp.asarray(pts), w, 6, n_init=2)
    assert float(det.inertia) <= float(pp2.inertia) * 1.3, (
        float(det.inertia), float(pp2.inertia))


def test_det_fit_perturbation_stable(rng):
    """O(1) weight perturbations (the sharded matting's boundary-band alpha
    flips reach the fit as a few flipped sample weights) must not rewrite
    the fit: inertia stays within 5%."""
    pts, _ = _blobs(rng, k=5, n=3000, spread=15.0, sep=60.0)
    w = np.ones(len(pts), np.float32)
    base = KM.kmeans_fit_det(jnp.asarray(pts), jnp.asarray(w), 5)
    w2 = w.copy()
    w2[rng.integers(0, len(pts), 10)] = 0.0
    pert = KM.kmeans_fit_det(jnp.asarray(pts), jnp.asarray(w2), 5)
    a, b = float(base.inertia), float(pert.inertia)
    assert abs(a - b) <= 0.05 * a + 1.0, (a, b)


def test_det_fit_ignores_zero_weight_points(rng):
    pts, true_centers = _blobs(rng, k=3, n=1500)
    junk = rng.uniform(0, 255, size=(500, 3)).astype(np.float32)
    allp = np.concatenate([pts, junk])
    w = np.concatenate([np.ones(len(pts)),
                        np.zeros(len(junk))]).astype(np.float32)
    res = KM.kmeans_fit_det(jnp.asarray(allp), jnp.asarray(w), 3)
    assert _match_centers(np.asarray(res.centers), true_centers) < 3.0
