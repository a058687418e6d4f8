"""Micro-bench: k-means fit + color-sample stage variants on the real chip.

Stage table (bench/profile_stages.py, 4K b=4) puts `color sample` at ~70 ms
and `kmeans fit` at ~54 ms — together half the pipeline. Both are small-data
stages (16k fit samples, 2M sort keys/image), so the time is overhead, not
FLOPs. This probes where it goes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from image_segmenter_tpu.ops import color as C
from image_segmenter_tpu.ops import unique as U
from image_segmenter_tpu.solvers import kmeans as KM


def timed(label, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:44s} {best * 1e3:9.2f} ms", flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    b = 4

    # ---- color sample: sort size sweep -------------------------------------
    h, w = 2160, 3840
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
                     127 + 100 * np.cos(xx / 131.0),
                     127 + 100 * np.sin((xx + yy) / 173.0)], axis=-1)
    img = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    imgs = jnp.asarray(np.broadcast_to(img, (b, h, w, 3)).copy())

    # stride 8 omitted: sporadic TPU device faults at 270x480 u8 strided
    # reads on this backend (reproducible; stride <= 4 is stable)
    for stride in (2, 4):
        @jax.jit
        def sample_fn(imgs, stride=stride):
            def one(rgb):
                sub = rgb[::stride, ::stride]
                packed = C.pack_rgb_u32(sub.reshape(-1, 3))
                fit = jnp.ones((packed.shape[0],), bool)
                return U.sorted_weighted_sample(packed, fit, cap=1 << 14)
            return jax.vmap(one)(imgs)

        n = (h // stride) * (w // stride)
        timed(f"sample stride={stride} ({n/1e6:.2f}M keys x{b})", sample_fn, imgs)

    # ---- k-means fit variants ---------------------------------------------
    vals = rng.integers(0, 255, (b, 1 << 14, 3)).astype(np.float32)
    wts = rng.random((b, 1 << 14)).astype(np.float32)
    valsj, wtsj = jnp.asarray(vals), jnp.asarray(wts)

    @jax.jit
    def fit_now(vals, wts):
        return jax.vmap(
            lambda v, c: KM.kmeans_fit(v, c, 16, n_init=2, seed=42).centers
        )(vals, wts)

    timed("fit current (n_init=2, b=4 vmap)", fit_now, valsj, wtsj)

    @jax.jit
    def fit_1(vals, wts):
        return jax.vmap(
            lambda v, c: KM.kmeans_fit(v, c, 16, n_init=1, seed=42).centers
        )(vals, wts)

    timed("fit n_init=1", fit_1, valsj, wtsj)

    @jax.jit
    def fit_cap(vals, wts):
        return jax.vmap(
            lambda v, c: KM.kmeans_fit(v, c, 16, n_init=2, max_iter=30,
                                       seed=42).centers
        )(vals, wts)

    timed("fit max_iter=30", fit_cap, valsj, wtsj)


if __name__ == "__main__":
    main()
