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
