"""Multi-host (DCN) initialization + hybrid mesh construction.

The reference is a single-process app with no communication backend at all
(SURVEY §5: "no NCCL/MPI/Gloo/UCX"). Here the framework scales past one host:
`initialize()` wraps jax.distributed so every process joins one JAX runtime,
and `hybrid_mesh()` lays the (data, space) axes out so that the *space* axis
(halo exchanges, CG reductions — latency-critical) stays on ICI within a
slice while the *data* axis (independent images, no per-step traffic beyond
metric psums) is the one crossing DCN — the standard slow-axis-outermost
recipe.

All entry points are usable single-process (they become no-ops / plain
meshes), so the same pipeline script runs on a laptop, one v5e-8, or a
multi-slice pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax

from image_segmenter_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join (or start) the multi-process JAX runtime.

    Arguments fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) and then to jax.distributed's own
    cluster auto-detection (TPU pod metadata, SLURM, ...). Single-process
    runs (nothing configured, num_processes in {None, 1}) return without
    touching the runtime.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_count() -> int:
    return jax.process_count()


def is_multi_host() -> bool:
    return jax.process_count() > 1


def hybrid_mesh(ici_shape: Optional[Sequence[int]] = None,
                dcn_shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = (DATA_AXIS, SPACE_AXIS)):
    """(data, space) mesh with DCN crossing only the leading (data) axis.

    ici_shape: per-slice mesh shape, defaults to (devices_per_process, 1).
    dcn_shape: how the slices tile the axes, defaults to (num_slices, 1) —
      i.e. data-parallel across slices, spatial sharding within a slice.

    Falls back to a plain contiguous mesh when the topology has no
    slice/host structure (CPU simulation, single host).
    """
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    n_dev = jax.device_count()
    if ici_shape is None:
        ici_shape = (n_dev // n_proc, 1)
    if dcn_shape is None:
        dcn_shape = (n_proc, 1)
    if n_proc == 1:
        # no DCN dimension: collapse to one contiguous mesh
        shape = tuple(int(i * d) for i, d in zip(ici_shape, dcn_shape))
        arr = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
        return Mesh(arr, axis_names=tuple(axis_names))
    try:
        from jax.experimental import mesh_utils

        devs = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape),
            devices=jax.devices(), allow_split_physical_axes=True)
        return Mesh(devs, axis_names=tuple(axis_names))
    except (ValueError, AssertionError):
        # CPU-simulated processes carry no slice topology metadata; group
        # devices by process id so the leading axis is the cross-host one.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        shape = tuple(int(i * d) for i, d in zip(ici_shape, dcn_shape))
        arr = np.asarray(devs[: int(np.prod(shape))]).reshape(shape)
        return Mesh(arr, axis_names=tuple(axis_names))
