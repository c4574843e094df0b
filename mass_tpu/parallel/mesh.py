"""Device-mesh construction helpers.

The framework's two scaling axes (see SURVEY.md §5.7):
  * ``data`` — independent episodes / frames batched and sharded
    (the reference's share-nothing process sharding, made SPMD);
  * ``map``  — the voxel grid sharded by rows across devices, so maps
    larger than one chip's HBM (or many maps at once) stay resident.

The reference's only distributed axis is NCCL data parallelism inside
detector training (reference: train_maskrcnn.py:133-136); everything
here rides XLA collectives over ICI instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Sequence[int],
              axis_names: Sequence[str],
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh of the requested shape from available devices."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh of {n} devices requested, {len(devices)} available")
    grid = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def data_map_mesh(n_devices: Optional[int] = None,
                  data: Optional[int] = None) -> Mesh:
    """Default 2D mesh: outer ``data`` (episode batch) x inner ``map``
    (voxel-grid rows).  With no hints, puts everything on ``map``."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = 2 if n % 2 == 0 and n > 2 else 1
    return make_mesh((data, n // data), ("data", "map"), devices)
