"""Structured throughput/quality instrumentation (SURVEY.md §5 "Tracing").

The reference's only timing is wall-clock labels in the GUI harness; here
every pipeline stage can be annotated for the JAX profiler and reported as
MP/sec, plus the mask-IoU metric BASELINE.json scores against.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace_stage(name: str):
    """jax.profiler annotation + wall-clock for one pipeline stage."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.time()
        yield
        _last_times[name] = time.time() - t0


_last_times: dict = {}


def mp_per_sec(num_pixels: int, seconds: float) -> float:
    return num_pixels / 1e6 / max(seconds, 1e-12)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two binary masks — the BASELINE acceptance metric."""
    a = np.asarray(a) > 0
    b = np.asarray(b) > 0
    union = (a | b).sum()
    if union == 0:
        return 1.0
    return float((a & b).sum() / union)


def log_metric(metric: str, value: float, unit: str,
               extra: Optional[dict] = None, stream=None) -> dict:
    """One structured JSON metric line (the bench.py contract shape)."""
    rec = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), file=stream or sys.stderr)
    return rec


def stage_report() -> dict:
    """Wall-clock of stages traced since process start (name -> seconds)."""
    return dict(_last_times)


def capture_device_trace(fn, outdir: str):
    """Run fn() under jax.profiler.trace and return the DEVICE-side op
    timings parsed from the written Chrome trace.

    Works through the axon tunnel (verified: the trace carries a
    /device:TPU lane with per-fusion durations). Returns a list of
    (op_name, total_us, count) sorted by total time, device lane only.
    """
    import glob
    import gzip
    import json
    import os

    import jax

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        fn()

    traces = sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        return []
    data = json.load(gzip.open(traces[-1]))
    events = data.get("traceEvents", [])
    lanes = {e["pid"]: e["args"].get("name", "")
             for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    # The device pid carries hierarchical lanes ("XLA Modules" parents the
    # "XLA Ops" fusions) — summing every lane double-counts. Keep one op
    # lane when present; otherwise everything on the device pid.
    dev_events = [e for e in events
                  if e.get("ph") == "X"
                  and "device" in lanes.get(e.get("pid"), "")]
    op_lanes = {(e["pid"], e["tid"]) for e in dev_events
                if "op" in tids.get((e.get("pid"), e.get("tid")), "").lower()}
    if op_lanes:
        dev_events = [e for e in dev_events
                      if (e.get("pid"), e.get("tid")) in op_lanes]
    agg = {}
    for e in dev_events:
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot, cnt = agg.get(name, (0.0, 0))
        agg[name] = (tot + dur, cnt + 1)
    return sorted(((n, t, c) for n, (t, c) in agg.items()),
                  key=lambda x: -x[1])
