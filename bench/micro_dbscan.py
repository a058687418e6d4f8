"""DBSCAN label-propagation timing at the adaptive_distance working shape.

The adaptive_distance 4K attribution (VERDICT r4 item 6) put t_dbscan at
~2.57 s — the dominant COMPUTE bucket of the call (ingest/map are tunnel
transfer). Each min-label propagation sweep is a full (N, N) pairwise
MXU pass, and hop-by-hop propagation needs graph-diameter-many sweeps on
chain-shaped color clusters; pointer doubling between sweeps (labels are
indices, so lbl[lbl] chases at gather cost) converges in log depth to the
same fixpoint (solvers/dbscan.py prop_body).

Reproduces the exact call shape adaptive_distance makes: LAB-normalized
unique colors of the 4K photo-like bench image, eps from the default
similarity_threshold.

Timing fences with a host transfer (CLAUDE.md: block_until_ready alone
under-reports over the axon tunnel).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    jax.block_until_ready(x)
    return np.asarray(x).ravel()[:1]


def main():
    from image_segmenter_tpu.solvers import dbscan as DB

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # LAB-normalized unique-color cloud of the same character as the 4K
    # bench photo: ~65k points in a normalized 3D space, eps = 0.125
    # (similarity_threshold 25 -> (25/100)*0.5, compat/_perceptual.py).
    n = 64717
    nbuck = 1 << 16
    pts = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pts_pad = np.zeros((nbuck, 3), np.float32)
    pts_pad[:n] = pts
    cnt_pad = np.zeros(nbuck, np.float32)
    cnt_pad[:n] = rng.integers(1, 2000, n)
    valid = np.zeros(nbuck, bool)
    valid[:n] = True

    args = (jnp.asarray(pts_pad), jnp.asarray(cnt_pad), jnp.asarray(valid),
            jnp.float32(0.125), jnp.float32(3.0))
    out = DB.dbscan_labels(*args)   # compile
    fence(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = DB.dbscan_labels(*args)
        fence(out)
        times.append(time.perf_counter() - t0)
    lbl = np.asarray(out)[:n]
    print(f"dbscan 65k pts: {min(times)*1e3:.0f} ms  "
          f"(clusters={len(set(lbl[lbl >= 0].tolist()))}, "
          f"noise={(lbl == -1).sum()})", flush=True)


if __name__ == "__main__":
    main()
