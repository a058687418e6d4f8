"""Benchmark: end-to-end pipeline MP/sec/chip (BASELINE.json headline metric).

Runs the flagship pipeline (U^2-Net background removal -> closed-form matting
refine -> 16-color k-means quantization) on batched 4K images on the real
chip and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MP/sec/chip", "vs_baseline": N/50}

Baseline target (BASELINE.md): >= 50 MP/sec/chip on v5e. The reference
publishes no numbers (single-threaded CPU app); 50 MP/s is the repo target.

Env knobs: BENCH_H, BENCH_W (default 2160x3840), BENCH_BATCH (default 1),
BENCH_REPS (default 3), BENCH_MODEL (default u2netp), BENCH_SECONDARY
(default isnet-general-use = the app's default model, reference
main_window.py:460; its MP/s prints as a JSON line on stderr so the headline
stdout line stays comparable round-over-round; set BENCH_SECONDARY=none to
skip). The stdout HEADLINE is the real-photo 4K mosaic batch (BASELINE
config 5 content; VERDICT r3 item 2); the synthetic-gradient config keeps
reporting on stderr one round for r01-r03 comparability. BENCH_PHOTO=0
forces the synthetic config back into the headline (fallback when the photo
corpus is unavailable).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp


    h = int(os.environ.get("BENCH_H", 2160))
    w = int(os.environ.get("BENCH_W", 3840))
    batch = int(os.environ.get("BENCH_BATCH", 4))
    reps = int(os.environ.get("BENCH_REPS", 5))
    model = os.environ.get("BENCH_MODEL", "u2netp")
    # Context: the tunneled "v5 lite" chip measures ~27.7 TFLOP/s matmul and
    # ~293.6 GB/s HBM stream (bench/chip_envelope.py), with ~60 ms per host
    # dispatch round-trip and an H2D transfer defect (BENCH_NOTES.md) that
    # pins STREAMING ingest at ~0.06 GB/s after the first big-input
    # execution. The streaming headline is transfer-bound, not compute-bound;
    # the device-resident numbers on stderr show the compute envelope.

    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    def h2d_probe(mb: int = 24, rounds: int = 4) -> float:
        """Measure this window's H2D tunnel rate (GB/s, best of `rounds`)
        so the artifact self-documents its weather (VERDICT r4 item 5):
        identical binaries have measured 9.6-35.9 MP/s streaming purely on
        the hour's 0.03-1.5 GB/s H2D swing (BENCH_NOTES.md)."""
        x = np.random.default_rng(0).integers(
            0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
        rates = []
        for _ in range(rounds):
            t0 = time.time()
            d = jax.device_put(x)
            jax.block_until_ready(d)
            rates.append(mb / 1024 / (time.time() - t0))
            del d
        return round(max(rates), 4)

    h2d_pre = h2d_probe()
    print(f"[bench] h2d weather (pre, fresh process): {h2d_pre:.3f} GB/s",
          file=sys.stderr)

    from image_segmenter_tpu.pipeline.segment import Pipeline

    rng = np.random.default_rng(0)
    # photo-like content: smooth gradients + blobs (more realistic color
    # statistics for k-means than white noise)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
        127 + 100 * np.cos(xx / 131.0),
        127 + 100 * np.sin((xx + yy) / 173.0),
    ], axis=-1)
    img = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    imgs = np.broadcast_to(img, (batch, h, w, 3)).copy()

    def photo_batch() -> np.ndarray | None:
        """4K mosaic tiled from the real-photo corpus (VERDICT r3 item 8:
        k-means/matting cost is content-dependent; synthetic sinusoid
        gradients stay the stdout headline one more round for
        comparability, the photo number reports on stderr)."""
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tests"))
            from helpers.corpus import load_corpus
            from PIL import Image

            tiles = load_corpus(size=1080)
            if not tiles:
                return None
            cols = -(-w // 1080)  # tiles per row
            canvases = []
            for b in range(batch):
                rows = []
                for r in range(-(-h // 1080)):
                    row = np.concatenate(
                        [tiles[(b + r * cols + c) % len(tiles)][1]
                         for c in range(cols)], axis=1)
                    rows.append(row)
                canvases.append(np.concatenate(rows, axis=0)[:h, :w])
            return np.stack(canvases)
        except Exception as e:
            print(f"[bench] photo batch unavailable: {e}", file=sys.stderr)
            return None

    pipes: dict[str, Pipeline] = {}

    def run_config(model_id: str, n_reps: int, content: np.ndarray = imgs,
                   tag: str = ""):
        if model_id not in pipes:
            pipes[model_id] = Pipeline(model=model_id, k=16)
        pipe = pipes[model_id]
        imgs = content
        t0 = time.time()
        out = pipe.run(imgs)
        jax.block_until_ready(out.rgba)
        print(f"[bench] {model_id}{tag}: first call (compile+run): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        # Streaming measurement: every rep ingests the batch from HOST numpy
        # (fresh 100MB through the tunnel) and the whole round blocks once —
        # transfers overlap compute exactly as a production feed would.
        times = []
        # min over more rounds: the tunnel's H2D rate swings ~20x by the
        # minute (BENCH_NOTES.md) and a single congested window should not
        # define the recorded number
        for _ in range(6):
            t0 = time.time()
            outs = [pipe.run(imgs) for _ in range(n_reps)]
            jax.block_until_ready(outs[-1].rgba)
            times.append((time.time() - t0) / n_reps)
            del outs
        best = min(times)
        mp = batch * h * w / 1e6
        print(f"[bench] {model_id}{tag}: "
              f"per-batch={['%.3f' % t for t in times]}s "
              f"(streaming x{n_reps}) mp/batch={mp:.2f}", file=sys.stderr)
        # Device-resident throughput on stderr for context: the streaming
        # number is capped by an axon-runtime transfer defect (~0.07 GB/s
        # H2D after the first big-input execution — BENCH_NOTES.md), which
        # direct-attached hardware does not have.
        xdev = jax.device_put(jnp.asarray(imgs))
        jax.block_until_ready(xdev)
        dev_times = []
        for _ in range(3):
            t0 = time.time()
            outs = [pipe._fn(pipe.session.variables, xdev)
                    for _ in range(n_reps)]
            jax.block_until_ready(outs[-1].rgba)
            dev_times.append((time.time() - t0) / n_reps)
            del outs
        print(f"[bench] {model_id}{tag}: device-resident "
              f"{mp / min(dev_times):.1f} MP/s "
              f"({min(dev_times)*1e3:.1f} ms/batch)", file=sys.stderr)
        return {
            "metric": f"pipeline_{model_id}_matting_kmeans16_{h}x{w}_b{batch}"
                      f"{tag}",
            "value": round(mp / best, 3),
            "unit": "MP/sec/chip",
            "vs_baseline": round(mp / best / 50.0, 4),
        }

    # HEADLINE = real-photo mosaic (VERDICT r3 item 2). It runs FIRST so its
    # "first call (compile+run)" stderr diagnostic — tracked round-over-round
    # in BENCH_NOTES — stays a cold-cache number. The synthetic-gradient
    # config (the r01-r03 headline) runs after, on stderr, for comparability.
    headline = None
    photos = None if os.environ.get("BENCH_PHOTO", "1") == "0" else photo_batch()
    if photos is not None:
        headline = run_config(model, reps, content=photos, tag="_photo")

    try:
        rec = run_config(model, reps if headline is None else max(2, reps // 2))
        print(f"[bench] synthetic {json.dumps(rec)}", file=sys.stderr)
        if headline is None:  # photo corpus unavailable: synthetic fallback
            headline = rec
    except Exception as e:
        if headline is None:
            raise
        print(f"[bench] synthetic config failed: {e}", file=sys.stderr)

    # Print the headline BEFORE the secondary config: the secondary's
    # isnet compile alone can take ~640 s through the tunnel (BENCH_r02),
    # and a timeout mid-secondary must not lose the already-measured
    # headline. Still exactly ONE stdout JSON line.
    # Weather stamp: post-probe runs AFTER the big-input executions, i.e.
    # under the same defect-pinned regime the streaming reps saw.
    h2d_post = h2d_probe()
    print(f"[bench] h2d weather (post, defect-pinned regime): "
          f"{h2d_post:.3f} GB/s", file=sys.stderr)
    headline["h2d_gbs"] = {"pre": h2d_pre, "post": h2d_post}
    print(json.dumps(headline), flush=True)

    # The app-default model (isnet-general-use at 1024^2, reference
    # main_window.py:460) reports on stderr.
    secondary = os.environ.get("BENCH_SECONDARY", "isnet-general-use")
    if secondary and secondary != "none" and secondary != model:
        try:
            rec = run_config(secondary, max(2, reps // 2))
            print(f"[bench] secondary {json.dumps(rec)}", file=sys.stderr)
        except Exception as e:  # never let the secondary sink the headline
            print(f"[bench] secondary {secondary} failed: {e}", file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
