"""Device mesh construction + canonical sharding specs."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, SPACE_AXIS),
              devices=None) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    shape=None uses all devices on the data axis (space=1). On a v5e-8 the
    natural meshes are (8, 1) for batched throughput and (1, 8) or (2, 4)
    for full-resolution spatial sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch of images (N, H, W, C): shard N across data, H across space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Single image (H, W, C): shard rows across the space axis."""
    return NamedSharding(mesh, P(SPACE_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
