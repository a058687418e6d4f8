"""Backend routing helpers shared by ops/solvers that pick TPU-only paths
(Pallas kernels, compensated-f32 solvers) vs portable XLA formulations."""

from __future__ import annotations

import jax


def targets_tpu(x) -> bool:
    """Whether this computation will actually lower for TPU.

    Routing on `jax.default_backend()` alone mis-selects TPU-only paths
    (e.g. a Pallas kernel with interpret=False) when a TPU-session
    computation really targets CPU — e.g. the matting f64 rung runs under
    `jax.default_device(cpu)`. Prefer the concrete device of the input; for
    tracers fall back to the active default-device config, then the process
    default backend.

    Known limitation: for a TRACER with no jax_default_device set, this
    returns the process default backend — a CPU-targeted jit built from an
    explicit `device_put(..., cpu_device)` (without a `default_device`
    context) in a TPU session still routes to the TPU path and will fail to
    lower. Callers that jit for an explicit non-default device must wrap the
    trace in `jax.default_device(...)`.
    """
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        try:
            return next(iter(x.devices())).platform == "tpu"
        except Exception:
            pass
    dev = jax.config.jax_default_device
    if dev is not None:  # may be a Device or a platform-name string
        if isinstance(dev, str):
            return dev == "tpu"
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"
