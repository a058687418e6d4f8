"""Settle the axon H2D transfer-degradation prevention experiment.

Round-2 bisect (BENCH_NOTES.md): in a fresh process H2D runs at 1.3-1.5
GB/s, but the FIRST execution of any program whose input is a
host-transferred buffer >= ~13 MB permanently throttles every later H2D in
the process to ~0.07 GB/s. One prevention-mode experiment was left
unsettled (VERDICT r3 item 2): if EVERY program input stays under the
trigger size forever — chunked `device_put` (< 13 MB each) + on-device
assembly as the only large-buffer producer — does the fast mode survive
executing the full pipeline on the (device-created) assembled batch?

    python bench/h2d_probe.py chunked   # the prevention experiment
    python bench/h2d_probe.py fused     # chunk ingest fused INTO the pipeline
    python bench/h2d_probe.py trigger   # positive control: reproduce defect

Each mode must run in its OWN fresh process (the degradation is permanent
per-process). Prints one JSON verdict line on stdout; probes on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, B = 2160, 3840, 4
CHUNK_ROWS = 1080  # (1080, 3840, 3) u8 = 11.86 MB < 13 MB trigger


def bw_probe(label: str, mb: int = 8, reps: int = 4) -> list[float]:
    """Measured GB/s of `reps` fresh `mb`-MB host->device transfers."""
    import jax

    rates = []
    for _ in range(reps):
        x = np.random.default_rng(0).integers(
            0, 255, mb << 20, dtype=np.uint8)  # fresh buffer each rep
        t0 = time.perf_counter()
        d = jax.device_put(x)
        d.block_until_ready()
        rates.append(mb / 1024 / (time.perf_counter() - t0))
        del d
    print(f"[probe] {label}: {['%.2f' % v for v in rates]} GB/s",
          file=sys.stderr, flush=True)
    return rates


def make_batch() -> np.ndarray:
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([
        127 + 100 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
        127 + 100 * np.cos(xx / 131.0),
        127 + 100 * np.sin((xx + yy) / 173.0),
    ], axis=-1)
    img = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
    return np.broadcast_to(img, (B, H, W, 3)).copy()


def run_chunked() -> dict:
    import jax
    import jax.numpy as jnp

    from image_segmenter_tpu.pipeline.segment import Pipeline

    fresh = bw_probe("fresh-process", 8)

    imgs = make_batch()
    nchunk = H // CHUNK_ROWS
    chunks = [np.ascontiguousarray(imgs[i, j * CHUNK_ROWS:(j + 1) * CHUNK_ROWS])
              for i in range(B) for j in range(nchunk)]
    assert all(c.nbytes < 13 * 2**20 for c in chunks), "chunk over trigger"

    @jax.jit
    def assemble(*cs):
        per = [jnp.concatenate(cs[i * nchunk:(i + 1) * nchunk], axis=0)
               for i in range(B)]
        return jnp.stack(per)

    d = [jax.device_put(c) for c in chunks]
    jax.block_until_ready(d)
    x = assemble(*d)  # inputs: host-transferred but each < 13 MB
    x.block_until_ready()
    after_assemble = bw_probe("after-assemble-exec", 8)

    pipe = Pipeline(model="u2netp", k=16)
    t0 = time.perf_counter()
    out = pipe._fn(pipe.session.variables, x)  # input: device-CREATED 95 MB
    jax.block_until_ready(out.rgba)
    print(f"[probe] pipeline first call (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    after_pipeline = bw_probe("after-pipeline-exec", 8)

    # full streaming cycles in prevention mode
    mp = B * H * W / 1e6
    cycle = []
    for _ in range(5):
        t0 = time.perf_counter()
        d = [jax.device_put(c) for c in chunks]
        x = assemble(*d)
        out = pipe._fn(pipe.session.variables, x)
        out.rgba.block_until_ready()
        cycle.append(time.perf_counter() - t0)
    print(f"[probe] streaming cycles: {['%.3f' % t for t in cycle]} s "
          f"({mp:.1f} MP/batch)", file=sys.stderr, flush=True)
    end = bw_probe("end", 8)

    survived = min(after_pipeline) > 5 * 0.07  # well above the 0.07 GB/s floor
    return {
        "mode": "chunked",
        "fast_mode_survived": bool(survived),
        "bw_fresh_gbps": round(max(fresh), 3),
        "bw_after_assemble_gbps": round(max(after_assemble), 3),
        "bw_after_pipeline_gbps": round(max(after_pipeline), 3),
        "bw_end_gbps": round(max(end), 3),
        "streaming_mp_s": round(mp / min(cycle), 2),
    }


def run_fused() -> dict:
    """The one prevention variant `chunked` did NOT test: fuse batch
    assembly INTO the pipeline program, so the pipeline's inputs are the 24
    sub-13 MB chunks themselves and no program in the process ever binds a
    >= 13 MB buffer as an *input* (the `chunked` run proved a 95 MB
    *output* — the assemble program — does not trigger the defect; the
    degradation there came from the separate pipeline program whose input
    was the assembled buffer)."""
    import jax
    import jax.numpy as jnp

    from image_segmenter_tpu.pipeline.segment import Pipeline

    fresh = bw_probe("fresh-process", 8)

    imgs = make_batch()
    nchunk = H // CHUNK_ROWS
    chunks = [np.ascontiguousarray(imgs[i, j * CHUNK_ROWS:(j + 1) * CHUNK_ROWS])
              for i in range(B) for j in range(nchunk)]
    assert all(c.nbytes < 13 * 2**20 for c in chunks), "chunk over trigger"

    pipe = Pipeline(model="u2netp", k=16)

    @jax.jit
    def fused(variables, *cs):
        per = [jnp.concatenate(cs[i * nchunk:(i + 1) * nchunk], axis=0)
               for i in range(B)]
        return pipe._fn(variables, jnp.stack(per))

    d = [jax.device_put(c) for c in chunks]
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    out = fused(pipe.session.variables, *d)
    jax.block_until_ready(out.rgba)
    print(f"[probe] fused pipeline first call (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    after_pipeline = bw_probe("after-fused-pipeline-exec", 8)

    mp = B * H * W / 1e6
    cycle = []
    for _ in range(6):
        t0 = time.perf_counter()
        d = [jax.device_put(c) for c in chunks]
        out = fused(pipe.session.variables, *d)
        out.rgba.block_until_ready()
        cycle.append(time.perf_counter() - t0)
    print(f"[probe] streaming cycles: {['%.3f' % t for t in cycle]} s "
          f"({mp:.1f} MP/batch)", file=sys.stderr, flush=True)
    end = bw_probe("end", 8)

    survived = min(after_pipeline) > 5 * 0.07
    return {
        "mode": "fused",
        "fast_mode_survived": bool(survived),
        "bw_fresh_gbps": round(max(fresh), 3),
        "bw_after_pipeline_gbps": round(max(after_pipeline), 3),
        "bw_end_gbps": round(max(end), 3),
        "streaming_mp_s": round(mp / min(cycle), 2),
    }


def run_trigger() -> dict:
    """Positive control: one 26 MB-input execution must reproduce the
    degradation (else the defect is gone and chunking is moot)."""
    import jax
    import jax.numpy as jnp

    fresh = bw_probe("fresh-process", 8)
    x = np.random.default_rng(0).integers(0, 255, 26 << 20, dtype=np.uint8)
    y = jax.jit(lambda v: v.astype(jnp.float32).sum())(x)
    y.block_until_ready()
    after = bw_probe("after-26MB-exec", 8)
    return {
        "mode": "trigger",
        "degraded": bool(max(after) < max(fresh) / 4),
        "bw_fresh_gbps": round(max(fresh), 3),
        "bw_after_gbps": round(max(after), 3),
    }


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "chunked"
    import jax

    print(f"[probe] backend={jax.default_backend()}", file=sys.stderr)
    res = {"trigger": run_trigger, "fused": run_fused,
           "chunked": run_chunked}[mode]()
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
