"""image_segmenter_tpu — a TPU-native image segmentation & quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jeffreyperez1620/image_segmenter (reference mounted at /root/reference):

- AI background removal (U^2-Net family, Flax)            -> models/
- GrabCut segmentation (GMM-EM + grid min-cut)            -> solvers/grabcut.py
- Closed-form matting (box-filter Laplacian + PCG)        -> solvers/matting.py
- Color quantizer suite (k-means/median-cut/LAB ward/
  DBSCAN/HSV/posterize/custom palette)                    -> solvers/, compat/color_simplify.py
- Region cleanup (connected components, merge, smoothing) -> ops/, compat/region_cleanup.py
- Tendril trimming (directional run-length scans)         -> kernels/, compat/tendril_trimming.py

The public, reference-compatible API lives in `image_segmenter_tpu.compat.*`
(also re-exported as the top-level `processing` package so UI code written
against the reference runs unchanged). Everything below compat is pure-JAX,
statically shaped, jit/pjit friendly, and designed for TPU: MXU-sized matmuls,
fused elementwise chains, `lax.while_loop` iteration instead of host round
trips, and `shard_map` spatial/batch parallelism over a device mesh.
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (huge win on tunneled TPU
    deployments where remote compiles cost minutes). Called at import unless
    ISEG_NO_COMPILE_CACHE is set; opt out per-process with that env var."""
    import jax

    if path is None:
        repo_default = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache")
        path = _os.environ.get("ISEG_CACHE_DIR", repo_default)
        # isolate per platform hint: CPU AOT blobs produced inside TPU-plugin
        # processes carry different machine-feature flags than pure-CPU
        # processes and warn (or worse) when cross-loaded
        path = _os.path.join(path, _os.environ.get("JAX_PLATFORMS", "default")
                             .replace(",", "_") or "default")
    try:
        _os.makedirs(path, exist_ok=True)
        probe = _os.path.join(path, ".w")
        with open(probe, "w"):
            pass
        _os.remove(probe)
    except OSError:
        path = _os.path.join(_os.path.expanduser("~"), ".cache",
                             "image_segmenter_tpu", "jax")
        _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


if not _os.environ.get("ISEG_NO_COMPILE_CACHE"):
    try:
        enable_compilation_cache()
    except Exception:  # never let cache setup break imports
        pass

from image_segmenter_tpu.config import Defaults  # noqa: F401
