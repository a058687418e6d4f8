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

from image_segmenter_tpu.config import Defaults  # noqa: F401
