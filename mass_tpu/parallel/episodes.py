"""Batched multi-episode mapping service.

The reference parallelizes evaluation by sharding tasks across host
processes, one CUDA GPU serving one episode at a time (reference:
agent.py:795-800 --start-task/--every-tasks, SURVEY.md §2.3).  On TPU
the same axis is SPMD: B episodes' maps live device-resident as one
batched pytree (sharded over the mesh's ``data`` axis, rows over
``map``), and each service call folds one frame per episode in a single
dispatch — host simulators run in parallel threads/processes and meet
the device at this batch boundary.

This turns the per-step device work from "one 224x224 frame" into
"B frames", amortizing dispatch latency and filling the chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap


class BatchedMapper:
    """B independent voxel maps updated in one jitted step per frame
    batch.

    Uses vmajor storage (partitionable leading axis) and the dense
    one-hot path under vmap; with a mesh, maps shard over
    ``(data, map)`` axes.
    """

    def __init__(self, batch: int, camera: CameraConfig,
                 geometry: MapGeometry, mesh: Optional[Mesh] = None):
        assert geometry.layout == "vmajor", (
            "batched maps use vmajor storage; pass "
            "MapGeometry(..., layout='vmajor')")
        self.batch = batch
        self.geometry = geometry
        self.camera = camera
        self.mesh = mesh
        self.rays = G.camera_rays(camera.height, camera.width,
                                  camera.focal_length,
                                  camera.focal_length)
        proto = VoxelMap.create(geometry)
        self._proto = proto

        data = jnp.zeros((batch, geometry.num_voxels,
                          geometry.feature_size))
        origins = jnp.zeros((batch, 3))
        if mesh is not None:
            data = jax.device_put(
                data, NamedSharding(mesh, P("data", "map", None)))
            origins = jax.device_put(
                origins, NamedSharding(mesh, P("data")))
        self.data = data
        self.origins = origins

        rays = self.rays
        num_classes = geometry.feature_size

        def single_update(data, origin, position, yaw, elevation,
                          depth, classes):
            vm = VoxelMap.create(geometry, (0.0, 0.0, 0.0))
            vm = vm.reset(origin)
            vm = VoxelMap(data=data, bins_x=vm.bins_x,
                          bins_y=vm.bins_y, bins_z=vm.bins_z,
                          geometry=geometry)
            feats = jax.nn.one_hot(classes, num_classes)
            return vm.update(rays, position, yaw, elevation, depth,
                             feats).data

        self._step = jax.jit(jax.vmap(single_update),
                             donate_argnums=0)

        def single_topdown(data, z_start, z_stop):
            vm = VoxelMap.create(geometry)
            vm = VoxelMap(data=data, bins_x=vm.bins_x,
                          bins_y=vm.bins_y, bins_z=vm.bins_z,
                          geometry=geometry)
            return vm.top_down(z_start, z_stop)

        self._topdown = jax.jit(
            jax.vmap(single_topdown, in_axes=(0, None, None)),
            static_argnums=(1, 2))

    def reset(self, episode_index: int, origin) -> None:
        """Zero one episode's map and re-centre it (host-side control;
        the next step call carries the change)."""
        self.data = self.data.at[episode_index].set(0.0)
        self.origins = self.origins.at[episode_index].set(
            jnp.asarray(origin, jnp.float32))

    def step(self, positions, yaws, elevations, depths,
             classes) -> None:
        """Fold one frame per episode: all inputs lead with ``[B]``."""
        self.data = self._step(
            self.data, self.origins,
            jnp.asarray(positions, jnp.float32),
            jnp.asarray(yaws, jnp.float32),
            jnp.asarray(elevations, jnp.float32),
            jnp.asarray(depths, jnp.float32),
            jnp.asarray(classes, jnp.int32))

    def top_down(self, z_start: int = 0, z_stop: int = 32):
        return self._topdown(self.data, z_start, z_stop)

    def voxel_map(self, episode_index: int) -> VoxelMap:
        """Single-episode view for the matcher / planner."""
        vm = VoxelMap.create(self.geometry)
        vm = vm.reset(self.origins[episode_index])
        return VoxelMap(data=self.data[episode_index],
                        bins_x=vm.bins_x, bins_y=vm.bins_y,
                        bins_z=vm.bins_z, geometry=self.geometry)
