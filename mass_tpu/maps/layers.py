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
    """Shared state handling: construction, reset, delegation."""

    def __init__(self, camera: CameraConfig, geometry: MapGeometry,
                 origin=(0.0, 0.0, 0.0)):
        self.camera = camera
        self.geometry = geometry
        self.rays = G.camera_rays(camera.height, camera.width,
                                  camera.focal_length,
                                  camera.focal_length)
        self.voxel_map = VoxelMap.create(geometry, origin)

    def reset(self, origin) -> None:
        self.voxel_map = self.voxel_map.reset(
            jnp.asarray(origin, jnp.float32))

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

    def __init__(self, camera: CameraConfig, config_geometry: MapGeometry
                 = None, origin=(0.0, 0.0, 0.0), **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=1, **geo_kwargs)
        super().__init__(camera, geometry, origin)

        @jax.jit
        def _update(vm, position, yaw, elevation, depth):
            classes = jnp.zeros(depth.shape[:2], jnp.int32)
            return vm.update_classes(self.rays, position, yaw,
                                     elevation, depth, classes)

        self._update = _update

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(self.voxel_map,
                                      *_pose_args(observation))


class SemanticMap(_BaseMap):
    """Per-voxel class-probability map fed by segmentation images."""

    def __init__(self, camera: CameraConfig, num_classes: int = 54,
                 config_geometry: MapGeometry = None,
                 origin=(0.0, 0.0, 0.0), **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=num_classes, **geo_kwargs)
        super().__init__(camera, geometry, origin)

        @jax.jit
        def _update(vm, position, yaw, elevation, depth, classes):
            return vm.update_classes(self.rays, position, yaw,
                                     elevation, depth, classes)

        self._update = _update

    def update_from_observation(self, observation: Dict) -> None:
        semantic = np.asarray(observation["semantic"])
        if semantic.ndim == 3:
            semantic = semantic[..., 0]
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            jnp.asarray(semantic, jnp.int32))


class FeatureMap(_BaseMap):
    """Dense-embedding map: a backbone maps the RGB frame to a
    ``[h/k, w/k, F]`` feature image; depth is subsampled at the feature
    stride's pixel centres (reference:
    resnet_projection_layer.py:201-211)."""

    def __init__(self, camera: CameraConfig, feature_size: int,
                 backbone: Callable[[jax.Array], jax.Array],
                 stride: int = 4, config_geometry: MapGeometry = None,
                 origin=(0.0, 0.0, 0.0), **geo_kwargs):
        geometry = config_geometry or MapGeometry(
            feature_size=feature_size, layout="vmajor", **geo_kwargs)
        super().__init__(camera.downsample(stride), geometry, origin)
        self.stride = stride

        @jax.jit
        def _update(vm, position, yaw, elevation, depth, rgb):
            feats = backbone(rgb)
            k = self.stride
            sub = depth[k // 2::k, k // 2::k]
            return vm.update(self.rays, position, yaw, elevation, sub,
                             feats)

        self._update = _update

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            jnp.asarray(observation["rgb"], jnp.float32))


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

        @jax.jit
        def _update(vm, position, yaw, elevation, depth, rgb):
            embedding = encoder(rgb).reshape(1, 1, feature_size)
            h, w = depth.shape[0], depth.shape[1]
            centre_depth = depth[h // 2:h // 2 + 1, w // 2:w // 2 + 1]
            return vm.update(self.rays, position, yaw, elevation,
                             centre_depth, embedding)

        self._update = _update

    def update_from_observation(self, observation: Dict) -> None:
        self.voxel_map = self._update(
            self.voxel_map, *_pose_args(observation),
            jnp.asarray(observation["rgb"], jnp.float32))


class MapSet(dict):
    """Named map collection with broadcast reset (the agent resets all
    maps to the episode origin; reference: agent.py:161-172)."""

    def reset_all(self, origin) -> None:
        for layer in self.values():
            layer.reset(origin)
