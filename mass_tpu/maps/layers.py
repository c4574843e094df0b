"""Concrete voxel-map layers: occupancy, semantic, dense-feature, CLIP.

Host-facing stateful wrappers pairing a per-layer feature encoder with
the functional VoxelMap core — the framework's equivalents of the
reference's projection-layer family:

  * OccupancyMap  — 1 channel of ones per depth pixel (reference:
    mass/nn/applications/occupancy_projection_layer.py:122-163)
  * SemanticMap   — one-hot class probabilities from the segmentation
    image (reference: semantic_projection_layer.py:165-216)
  * FeatureMap    — backbone embeddings at reduced camera resolution
    with strided-subsampled depth (reference:
    resnet_projection_layer.py:121-213)
  * ClipMap       — a whole-image embedding scattered at the centre ray
    (reference: clip_projection_layer.py:61-194)

Each wrapper keeps the jitted update specialized once (rays and camera
baked in) and mutates only its ``voxel_map`` pytree reference, so the
host side stays trivially simple while every update is one device
dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap


def _pose_args(observation: Dict):
    return (jnp.asarray(observation["position"], jnp.float32),
            jnp.float32(observation["yaw"]),
            jnp.float32(observation["elevation"]),
            jnp.asarray(observation["depth"], jnp.float32))


class _BaseMap:
    """Shared state handling: construction, reset, delegation.

    ``mesh`` (optional) row-shards the map over a device-mesh axis
    (parallel/sharding.py): storage switches to the partitionable
    vmajor layout, updates run collective-free under ``shard_map``
    (each device owns ``V/n`` voxel rows; corner records self-route by
    bin id), and reads happen under jit's automatic partitioning.  This
    is the framework's spatial scaling axis (SURVEY.md §5.7-5.8)."""

    # layers whose update is (shared binning) + (one-hot splat); map
    # groups reuse one orient/bin/corner pass per camera+grid signature
    shared_onehot = False

    def __init__(self, camera: CameraConfig, geometry: MapGeometry,
                 origin=(0.0, 0.0, 0.0), mesh=None,
                 mesh_axis: str = "map"):
        self.camera = camera
        if mesh is not None:
            geometry = dataclasses.replace(geometry, layout="vmajor")
            assert geometry.num_voxels % mesh.shape[mesh_axis] == 0, (
                f"num_voxels {geometry.num_voxels} must divide over the "
                f"{mesh.shape[mesh_axis]}-device '{mesh_axis}' axis")
        self.geometry = geometry
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.rays = G.camera_rays(camera.height, camera.width,
                                  camera.focal_length,
                                  camera.focal_length)
        self.voxel_map = self._place(VoxelMap.create(geometry, origin))
        # host-side reset generation: bins change ONLY here, so host
        # midpoint caches (core/voxelmap.HostMapToWorld) key on this
        # instead of re-reading bins off the device every jitted update
        self.bins_epoch = 0

    def _place(self, vm: VoxelMap) -> VoxelMap:
        if self.mesh is None:
            return vm
        from mass_tpu.parallel.sharding import shard_voxelmap
        return shard_voxelmap(vm, self.mesh, self.mesh_axis)

    def reset(self, origin) -> None:
        self.voxel_map = self._place(self.voxel_map.reset(
            jnp.asarray(origin, jnp.float32)))
        self.bins_epoch += 1

    # convenience delegation for planner / matcher / visualization
    def world_to_map(self, coords):
        return self.voxel_map.world_to_map(coords)

    def map_to_world(self, coords):
        return self.voxel_map.map_to_world(coords)

    def top_down(self, z_start=0, z_stop=32):
        return self.voxel_map.top_down(z_start, z_stop)


class OccupancyMap(_BaseMap):
    """Single-channel density map: every valid depth pixel deposits
    occupancy mass (class 0)."""

    shared_onehot = True

    def __init__(self, camera: CameraConfig, config_geometry: MapGeometry
                 = None, origin=(0.0, 0.0, 0.0), mesh=None,
                 mesh_axis: str = "map", **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=1, **geo_kwargs)
        super().__init__(camera, geometry, origin, mesh, mesh_axis)
        rays = self.rays

        def update_fn(vm, position, yaw, elevation, depth, aux):
            classes = jnp.zeros(depth.shape[:2], jnp.int32)
            return vm.update_classes(rays, position, yaw, elevation,
                                     depth, classes)

        self.update_fn = update_fn
        if mesh is not None:
            from mass_tpu.parallel.sharding import sharded_update_fn
            sharded = sharded_update_fn(mesh, self.geometry, mesh_axis,
                                        onehot=True)
            self._update = lambda vm, p, y, e, d: sharded(
                vm, rays, p, y, e, d,
                jnp.zeros(rays.shape[:2], jnp.int32))
        else:
            self._update = jax.jit(
                lambda vm, p, y, e, d: update_fn(vm, p, y, e, d, None))

    def classes_for(self, aux, depth):
        return jnp.zeros(depth.shape[:2], jnp.int32)

    def aux_from_observation(self, observation: Dict):
        return None

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(self.voxel_map,
                                      *_pose_args(observation))


class SemanticMap(_BaseMap):
    """Per-voxel class-probability map fed by segmentation images."""

    shared_onehot = True

    def __init__(self, camera: CameraConfig, num_classes: int = 54,
                 config_geometry: MapGeometry = None,
                 origin=(0.0, 0.0, 0.0), mesh=None,
                 mesh_axis: str = "map", **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=num_classes, **geo_kwargs)
        super().__init__(camera, geometry, origin, mesh, mesh_axis)
        rays = self.rays

        def update_fn(vm, position, yaw, elevation, depth, classes):
            return vm.update_classes(rays, position, yaw, elevation,
                                     depth, classes)

        self.update_fn = update_fn
        if mesh is not None:
            from mass_tpu.parallel.sharding import sharded_update_fn
            sharded = sharded_update_fn(mesh, self.geometry, mesh_axis,
                                        onehot=True)
            self._update = lambda vm, p, y, e, d, classes: sharded(
                vm, rays, p, y, e, d, classes)
        else:
            self._update = jax.jit(update_fn)

    def classes_for(self, aux, depth):
        from mass_tpu.core import geometry as _G
        h, w = self.rays.shape[0], self.rays.shape[1]
        return _G.upsample_features(aux[..., None], h, w)[..., 0]

    def aux_from_observation(self, observation: Dict):
        semantic = np.asarray(observation["semantic"])
        if semantic.ndim == 3:
            semantic = semantic[..., 0]
        return jnp.asarray(semantic, jnp.int32)

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            self.aux_from_observation(observation))


class FeatureMap(_BaseMap):
    """Dense-embedding map: a backbone maps the RGB frame to a
    ``[h/k, w/k, F]`` feature image; depth is subsampled at the feature
    stride's pixel centres (reference:
    resnet_projection_layer.py:201-211)."""

    def __init__(self, camera: CameraConfig, feature_size: int,
                 backbone: Callable[[jax.Array], jax.Array],
                 stride: int = 4, config_geometry: MapGeometry = None,
                 origin=(0.0, 0.0, 0.0), mesh=None,
                 mesh_axis: str = "map", **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=feature_size, layout="vmajor", **geo_kwargs)
        super().__init__(camera.downsample(stride), geometry, origin,
                         mesh, mesh_axis)
        self.stride = stride
        rays = self.rays

        def update_fn(vm, position, yaw, elevation, depth, rgb):
            feats = backbone(rgb)
            k = stride
            sub = depth[k // 2::k, k // 2::k]
            return vm.update(rays, position, yaw, elevation, sub,
                             feats)

        self.update_fn = update_fn
        if mesh is not None:
            from mass_tpu.parallel.sharding import sharded_update_fn
            sharded = sharded_update_fn(mesh, self.geometry, mesh_axis,
                                        onehot=False)
            embed = jax.jit(lambda rgb: backbone(rgb))

            def _sharded_update(vm, p, y, e, depth, rgb):
                k = stride
                return sharded(vm, rays, p, y, e,
                               depth[k // 2::k, k // 2::k], embed(rgb))

            self._update = _sharded_update
        else:
            self._update = jax.jit(update_fn)

    def aux_from_observation(self, observation: Dict):
        return jnp.asarray(observation["rgb"], jnp.float32)

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            self.aux_from_observation(observation))


class ClipMap(_BaseMap):
    """Whole-image embedding scattered at the image-centre ray: a 1x1
    feature camera (reference: clip_projection_layer.py:124-194)."""

    def __init__(self, camera: CameraConfig, feature_size: int,
                 encoder: Callable[[jax.Array], jax.Array],
                 config_geometry: MapGeometry = None,
                 origin=(0.0, 0.0, 0.0), **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=feature_size, layout="vmajor", **geo_kwargs)
        # centre ray only: a 1x1 camera
        centre = CameraConfig(height=1, width=1,
                              vertical_fov_degrees=
                              camera.vertical_fov_degrees)
        super().__init__(centre, geometry, origin)
        self.full_camera = camera

        rays = self.rays

        def update_fn(vm, position, yaw, elevation, depth, rgb):
            embedding = encoder(rgb).reshape(1, 1, feature_size)
            h, w = depth.shape[0], depth.shape[1]
            centre_depth = depth[h // 2:h // 2 + 1, w // 2:w // 2 + 1]
            return vm.update(rays, position, yaw, elevation,
                             centre_depth, embedding)

        self.update_fn = update_fn
        self._update = jax.jit(update_fn)

    def aux_from_observation(self, observation: Dict):
        return jnp.asarray(observation["rgb"], jnp.float32)

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            jnp.asarray(observation["rgb"], jnp.float32))


class MapSet(dict):
    """Named map collection with broadcast reset (the agent resets all
    maps to the episode origin; reference: agent.py:161-172) and fused
    group updates (all of a step's map updates in ONE device dispatch —
    host-to-device round trips dominate live agent loops)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._group_fns = {}

    def reset_all(self, origin) -> None:
        for layer in self.values():
            layer.reset(origin)

    def update_group(self, names, observation: Dict) -> None:
        """Update several maps from one observation in one jitted call."""
        names = [n for n in names if n in self]
        # row-sharded layers update through their own shard_map path
        # (collective-free slab routing) rather than the fused group jit
        for n in [n for n in names if self[n].mesh is not None]:
            self[n].update_from_observation(observation)
        names = [n for n in names if self[n].mesh is None]
        if not names:
            return
        key = tuple(names)
        fn = self._group_fns.get(key)
        if fn is None:
            layers = [self[n] for n in names]

            import functools

            @functools.partial(jax.jit, donate_argnums=0)
            def fn(vms, position, yaw, elevation, depth, auxes):
                # one orient/bin/corner pass per camera+grid signature,
                # shared by every one-hot map in the group (maps reset
                # together share bins — see MapSet.reset_all); each
                # signature's maps then splat in ONE kernel launch
                # (core/voxelmap.apply_onehot_group)
                from mass_tpu.core.voxelmap import apply_onehot_group
                shared = {}          # sig -> (ids, weights)
                grouped = {}         # sig -> list of (slot, vm, classes)
                out = [None] * len(layers)
                for slot, (layer, vm, aux) in enumerate(
                        zip(layers, vms, auxes)):
                    if not layer.shared_onehot:
                        out[slot] = layer.update_fn(
                            vm, position, yaw, elevation, depth, aux)
                        continue
                    g = vm.geometry
                    sig = (layer.rays.shape, g.map_height, g.map_width,
                           g.map_depth, g.grid_resolution)
                    if sig not in shared:
                        shared[sig] = vm.contributions(
                            layer.rays, position, yaw, elevation,
                            depth)
                    grouped.setdefault(sig, []).append(
                        (slot, vm, layer.classes_for(aux, depth)))
                for sig, members in grouped.items():
                    ids, weights = shared[sig]
                    new_vms = apply_onehot_group(
                        [vm for _, vm, _ in members], ids, weights,
                        [cls for _, _, cls in members])
                    for (slot, _, _), nvm in zip(members, new_vms):
                        out[slot] = nvm
                return tuple(out)

            self._group_fns[key] = fn
        layers = [self[n] for n in names]
        vms = tuple(layer.voxel_map for layer in layers)
        auxes = tuple(layer.aux_from_observation(observation)
                      for layer in layers)
        new_vms = fn(vms, *_pose_args(observation), auxes)
        for layer, vm in zip(layers, new_vms):
            layer.voxel_map = vm
