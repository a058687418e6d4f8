"""Per-stage wall-clock attribution of the flagship pipeline on the real chip.

Times each pipeline stage (pre-staged device inputs, 8 dispatches amortized,
single block at the end) plus host->device ingest and the full fused program,
then prints a stage table with percent-of-total accounting. VERDICT round-1
asked for >= 90% of pipeline wall-clock attributed; this is the tool.

Usage: python bench/profile_stages.py  [H W B reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(label, fn, *args, reps=8, results=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:28s} {best * 1e3:9.2f} ms", flush=True)
    if results is not None:
        results[label] = best
    return out


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    print(f"backend={jax.default_backend()} shape=({b},{h},{w},3)", flush=True)

    from image_segmenter_tpu.config import DEFAULTS
    from image_segmenter_tpu.models import registry as REG
    from image_segmenter_tpu.ops import histogram as HG
    from image_segmenter_tpu.ops import morphology as M
    from image_segmenter_tpu.ops import resize as RZ
    from image_segmenter_tpu.ops import color as C
    from image_segmenter_tpu.ops import unique as U
    from image_segmenter_tpu.solvers import kmeans as KM
    from image_segmenter_tpu.solvers.matting import solve_alpha_cf
    from image_segmenter_tpu.pipeline import segment as SEG

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
                     127 + 100 * np.cos(xx / 131.0),
                     127 + 100 * np.sin((xx + yy) / 173.0)], axis=-1)
    img = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    imgs_np = np.broadcast_to(img, (b, h, w, 3)).copy()

    R = {}
    # 0. ingest (host -> device through the tunnel)
    t0 = time.time()
    imgs = jax.device_put(imgs_np)
    jax.block_until_ready(imgs)
    t_ing = time.time() - t0
    for _ in range(2):
        t0 = time.time()
        imgs = jax.device_put(imgs_np)
        jax.block_until_ready(imgs)
        t_ing = min(t_ing, time.time() - t0)
    R["ingest"] = t_ing
    print(f"{'ingest(host->dev 100MB)':28s} {t_ing * 1e3:9.2f} ms", flush=True)

    sess = REG.new_session("u2netp")
    nh, nw = sess.spec.size
    mean = jnp.asarray(sess.spec.mean, jnp.float32)
    std = jnp.asarray(sess.spec.std, jnp.float32)

    down = jax.jit(jax.vmap(lambda im: RZ.resize_u8(im, (nh, nw), RZ.LANCZOS_PIL)))
    small = timed("resize 4K->320 (LANCZOS)", down, imgs, results=R)

    @jax.jit
    def cnn(variables, small):
        x = small.astype(jnp.float32)
        x = x / jnp.maximum(jnp.max(x, axis=(1, 2, 3), keepdims=True), 1e-6)
        x = (x - mean) / std
        d0 = sess.module.apply(variables, x, train=False)[0][..., 0]
        mi = jnp.min(d0, axis=(1, 2), keepdims=True)
        ma = jnp.max(d0, axis=(1, 2), keepdims=True)
        m01 = (d0 - mi) / jnp.maximum(ma - mi, 1e-12)
        return jnp.clip(jnp.floor(m01 * 255.0 + 0.5), 0, 255).astype(jnp.uint8)

    mask_small = timed("cnn u2netp 320^2 b4", cnn, sess.variables, small, results=R)

    up = jax.jit(jax.vmap(lambda m: RZ.resize_u8(m, (h, w), RZ.LANCZOS_PIL)))
    alpha0 = timed("mask 320->4K (LANCZOS)", up, mask_small, results=R)

    sh, sw = RZ.scale_to_max_dim(h, w, DEFAULTS.matting_max_dim)

    @jax.jit
    def area_down(imgs, alpha0):
        rgb_s = jax.vmap(lambda im: RZ.resize_u8(im, (sh, sw), RZ.AREA))(imgs)
        a_s = jax.vmap(lambda a: RZ.resize_u8(a, (sh, sw), RZ.AREA))(alpha0)
        return rgb_s, a_s

    (rgb_s, a_s) = timed(f"AREA 4K->{sh}x{sw}", area_down, imgs, alpha0, results=R)

    trimap_fn = jax.jit(jax.vmap(SEG._trimap_device))
    trimap = timed("trimap", trimap_fn, a_s, results=R)

    @jax.jit
    def matting(rgb_s, trimap, a_s):
        def one(r, t, a0):
            a, ok, it, res = solve_alpha_cf(r.astype(jnp.float32) / 255.0, t,
                                            max_iter=200, rtol=1e-4,
                                            half_stats=True,
                                            x0=a0.astype(jnp.float32) / 255.0)
            return a, it
        a, it = jax.vmap(one)(rgb_s, trimap, a_s)
        return jnp.clip(jnp.floor(a * 255.0 + 0.5), 0, 255).astype(jnp.uint8), it

    (alpha_m, iters) = timed(f"matting CG {sh}x{sw}", matting, rgb_s, trimap,
                             a_s, results=R)
    print(f"{'':28s} CG iters: {np.asarray(iters)}", flush=True)

    up_lin = jax.jit(jax.vmap(lambda a: RZ.resize_u8(a, (h, w), RZ.LINEAR)))
    alpha_full = timed("alpha up->4K (LINEAR)", up_lin, alpha_m, results=R)

    sharp_fn = jax.jit(jax.vmap(SEG._sharp_alpha))
    sharp = timed("otsu+close/open 4K", sharp_fn, alpha_full, results=R)

    # k-means decomposition (grid sample path, segment.py)
    @jax.jit
    def sample_fn(imgs, sharp):
        def one(rgb, nt):
            hh, ww = rgb.shape[:2]
            flat = rgb.reshape(-1, 3)
            ntf = nt.reshape(-1)
            brightness = jnp.mean(flat.astype(jnp.float32), axis=1)
            n30 = jnp.sum(ntf & (brightness > 30))
            n10 = jnp.sum(ntf & (brightness > 10))
            thr = jnp.where(n30 >= 16, 30.0, jnp.where(n10 > 0, 10.0, -1.0))
            fit = ntf & (brightness > thr)
            from image_segmenter_tpu.pipeline.segment import grid_sample_colors
            sample, wts = grid_sample_colors(rgb, fit.reshape(hh, ww),
                                             min_mass=max(16, 64))
            return sample, wts, thr, fit
        return jax.vmap(one)(imgs, sharp)

    (vals, wts, thr, fit) = timed("color sample (strided)", sample_fn, imgs,
                                  sharp, results=R)

    @jax.jit
    def fit_fn(vals, wts):
        def one(sample, c):
            return KM.kmeans_fit(sample, c, 16, n_init=2,
                                 seed=DEFAULTS.kmeans_seed).centers
        return jax.vmap(one)(vals, wts)

    centers = timed("kmeans fit (2 restarts)", fit_fn, vals, wts, results=R)

    from image_segmenter_tpu.kernels.pallas_quantize import quantize_map

    @jax.jit
    def qmap_fn(imgs, sharp, centers, thr):
        def one(rgb, nt, c, t):
            alpha_u8 = nt.astype(jnp.uint8) * 255
            cu8 = jnp.clip(c, 0, 255).astype(jnp.uint8)
            return quantize_map(rgb, alpha_u8, cu8.astype(jnp.float32),
                                jnp.int32(16), t, k_max=16)
        return jax.vmap(one)(imgs, sharp, centers, thr)

    timed("quantize map (pallas)", qmap_fn, imgs, sharp, centers, thr, results=R)

    # full pipeline
    from image_segmenter_tpu.pipeline.segment import Pipeline
    pipe = Pipeline(model=os.environ.get("PROFILE_MODEL", "u2netp"), k=16)
    x_dev = jax.device_put(jnp.asarray(imgs_np))

    def full(x):
        return pipe._fn(pipe.session.variables, x)

    timed("FULL pipeline (dev input)", full, x_dev, reps=4, results=R)

    total = R["FULL pipeline (dev input)"]
    staged = sum(v for k, v in R.items()
                 if k not in ("FULL pipeline (dev input)", "ingest"))
    print(f"\nsum(stages) = {staged*1e3:.1f} ms  vs  full = {total*1e3:.1f} ms "
          f"({staged/total*100:.0f}% attributed)", flush=True)
    mp = b * h * w / 1e6
    print(f"MP/s (full, device-resident input) = {mp/total:.2f}")
    print(f"MP/s (full + fresh ingest)         = {mp/(total + R['ingest']):.2f}")


if __name__ == "__main__":
    main()
