"""Ward NN-chain and DBSCAN solvers vs sklearn oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.cluster import AgglomerativeClustering, DBSCAN
from sklearn.metrics import adjusted_rand_score

from image_segmenter_tpu.solvers import agglomerative as AG
from image_segmenter_tpu.solvers import dbscan as DB


def _pad_pts(pts, n):
    out = np.zeros((n, pts.shape[1]), np.float32)
    out[: len(pts)] = pts
    return out


@pytest.mark.parametrize("k", [2, 4, 7])
def test_ward_matches_sklearn_partition(rng, k):
    centers = rng.uniform(0, 100, (k, 3))
    centers += np.arange(k)[:, None] * 60  # separate
    pts = np.concatenate([c + rng.normal(0, 2.0, (40, 3)) for c in centers]).astype(np.float32)
    perm = rng.permutation(len(pts))
    pts = pts[perm]

    ref = AgglomerativeClustering(n_clusters=k, linkage="ward").fit_predict(pts)
    n = 512
    ours = np.asarray(AG.ward_labels(jnp.asarray(_pad_pts(pts, n)), jnp.int32(len(pts)), k))[: len(pts)]
    assert adjusted_rand_score(ref, ours) == 1.0


def test_ward_hard_case(rng):
    """Overlapping blobs: partitions should still agree almost everywhere."""
    pts = rng.normal(0, 10, (150, 3)).astype(np.float32)
    pts[50:100] += 18.0
    pts[100:] += 36.0
    ref = AgglomerativeClustering(n_clusters=3, linkage="ward").fit_predict(pts)
    ours = np.asarray(AG.ward_labels(jnp.asarray(_pad_pts(pts, 256)), jnp.int32(len(pts)), 3))[: len(pts)]
    assert adjusted_rand_score(ref, ours) > 0.95


def test_dbscan_matches_sklearn(rng):
    # Three dense blobs + sparse noise, with duplicated points.
    blobs = [rng.normal(c, 0.3, (60, 3)) for c in ([0, 0, 0], [5, 5, 5], [10, 0, 5])]
    noise = rng.uniform(-3, 13, (15, 3))
    pts = np.concatenate(blobs + [noise])
    # duplicate some rows to exercise multiplicity handling
    dup = pts[rng.integers(0, len(pts), 40)]
    full = np.concatenate([pts, dup])

    eps, ms = 1.0, 3
    ref = DBSCAN(eps=eps, min_samples=ms).fit_predict(full)

    uniq, inv, cnts = np.unique(full.round(9), axis=0, return_inverse=True, return_counts=True)
    n = 512
    ours_u = np.asarray(DB.dbscan_labels(
        jnp.asarray(_pad_pts(uniq.astype(np.float32), n)),
        jnp.asarray(np.pad(cnts.astype(np.float32), (0, n - len(uniq)))),
        jnp.asarray(np.arange(n) < len(uniq)),
        jnp.float32(eps), jnp.float32(ms),
    ))[: len(uniq)]
    ours = ours_u[inv]

    # Compare as partitions over non-noise agreement + identical noise sets.
    both_clustered = (ref >= 0) & (ours >= 0)
    assert adjusted_rand_score(ref[both_clustered], ours[both_clustered]) > 0.99
    # noise sets nearly identical (border ties may differ)
    assert ((ref == -1) != (ours == -1)).mean() < 0.02


def test_dbscan_core_via_duplicates():
    """A point duplicated >= min_samples times is a core point by itself."""
    pts = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    counts = np.array([5.0, 1.0], np.float32)
    n = 512
    lbl = np.asarray(DB.dbscan_labels(
        jnp.asarray(_pad_pts(pts, n)),
        jnp.asarray(np.pad(counts, (0, n - 2))),
        jnp.asarray(np.arange(n) < 2),
        jnp.float32(0.5), jnp.float32(3.0),
    ))[:2]
    assert lbl[0] >= 0      # core via multiplicity
    assert lbl[1] == -1     # isolated singleton -> noise
