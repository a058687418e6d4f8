"""Pipeline parallelism: the three phases staged across mesh sub-groups.

SURVEY §2 "Parallelism & distributed backend" / BASELINE config 5 call for
staging rembg -> matting -> quantize across sub-groups of the device mesh
for streaming throughput. The single-controller JAX version of pipelining:

- each phase is jitted onto its OWN sub-mesh (disjoint devices), data
  parallel over the batch within the sub-mesh;
- inter-stage activations hop sub-meshes with an explicit device_put (ICI
  transfers, scheduled asynchronously);
- the host feeds micro-batches in a plain loop. Dispatch is asynchronous, so
  while micro-batch i computes its CNN on group 1, micro-batch i-1 runs
  matting on group 2 and i-2 quantizes on group 3 — steady-state throughput
  is max(stage_time) + transfer instead of sum(stage_time).

Use when batches stream continuously and the phases are individually too
small to fill the whole mesh (the CNN at 320^2 saturates ~2 chips while
matting+quantize at 4K want the rest). For single large batches the fused
`Pipeline` (one jit over everything, full mesh) remains the right tool.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_segmenter_tpu.config import DEFAULTS
from image_segmenter_tpu.models import registry as REG
from image_segmenter_tpu.pipeline.segment import (PipelineOutput, StageFns,
                                                  make_stage_fns)

_STAGE_AXIS = "data"


def split_stage_meshes(devices: Optional[Sequence] = None,
                       fractions: Sequence[int] = (2, 1, 1)):
    """Partition a device list into 3 stage sub-meshes sized by `fractions`.

    Default (2, 1, 1): half the chips on the CNN, a quarter each on
    matting and quantize — matching the profiled stage weights at 4K (CNN
    16 ms, matting 33 ms, quantize ~50 ms per b=4 batch scale with batch,
    while matting dominates per-pixel cost at higher resolutions).
    """
    devices = list(devices if devices is not None else jax.devices())
    total = sum(fractions)
    n = len(devices)
    if n < 3:
        raise ValueError(f"pipeline parallelism needs >= 3 devices, have {n}")
    sizes = [max(1, (n * f) // total) for f in fractions]
    while sum(sizes) > n:
        sizes[int(np.argmax(sizes))] -= 1
    while sum(sizes) < n:
        sizes[int(np.argmin(sizes))] += 1
    meshes = []
    off = 0
    for s in sizes:
        meshes.append(Mesh(np.asarray(devices[off:off + s]),
                           axis_names=(_STAGE_AXIS,)))
        off += s
    return tuple(meshes)


class StagedPipeline:
    """Streaming pipeline with each phase on its own device sub-group."""

    def __init__(self, model: str = "u2netp", k: int = 16,
                 matting_dim: Optional[int] = None, cg_iters: int = 200,
                 meshes=None):
        self.session = REG.new_session(model)
        self.k = k
        self.matting_dim = matting_dim or DEFAULTS.matting_max_dim
        self.cg_iters = cg_iters
        self.meshes = tuple(meshes) if meshes is not None else split_stage_meshes()
        if len(self.meshes) != 3:
            raise ValueError("need exactly 3 stage meshes (cnn, matting, quantize)")
        stages: StageFns = make_stage_fns(self.session, self.k,
                                          self.matting_dim, self.cg_iters)

        def batched(mesh):
            return NamedSharding(mesh, P(_STAGE_AXIS))

        m1, m2, m3 = self.meshes
        self._in1 = batched(m1)
        self._in2 = batched(m2)
        self._in3 = batched(m3)
        self._s1 = jax.jit(stages.cnn, out_shardings=batched(m1))
        self._s2 = jax.jit(stages.matting,
                           out_shardings=(batched(m2), batched(m2)))
        self._s3 = jax.jit(stages.quantize,
                           out_shardings=(batched(m3), batched(m3)))
        self._vars1 = jax.device_put(
            self.session.variables,
            NamedSharding(m1, P()))  # replicated over the CNN group

    def run(self, imgs_u8: np.ndarray) -> PipelineOutput:
        """One micro-batch through all three stages (correctness path)."""
        return next(iter(self.run_stream([imgs_u8])))

    def run_stream(self, batches: Iterable[np.ndarray]) -> Iterator[PipelineOutput]:
        """Stream micro-batches; dispatch is asynchronous so consecutive
        batches overlap across the three sub-groups."""
        for imgs in batches:
            x1 = jax.device_put(jax.numpy.asarray(imgs), self._in1)
            mask_small = self._s1(self._vars1, x1)
            # hop to the matting group (ICI transfer, async)
            x2 = jax.device_put(x1, self._in2)
            ms2 = jax.device_put(mask_small, self._in2)
            sharp, alpha = self._s2(x2, ms2)
            x3 = jax.device_put(x2, self._in3)
            sharp3 = jax.device_put(sharp, self._in3)
            rgba, palettes = self._s3(x3, sharp3)
            alpha3 = jax.device_put(alpha, self._in3)
            yield PipelineOutput(rgba, alpha3, palettes)
