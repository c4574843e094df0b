"""The voxel feature map as an immutable pytree + functional transforms.

Replaces the reference's stateful ``nn.Module`` voxel grid (reference:
mass/nn/base_projection_layer.py) with a frozen dataclass registered as a
JAX pytree: ``update`` / ``reset`` return new states, so the whole mapping
pipeline jits, scans over frame sequences, vmaps over episode batches, and
shards over device meshes.  Shape/scale metadata (`MapGeometry`) rides
along as static aux data, so jitted functions specialize per geometry.

Data layout: ``data[row, col, depth, feature]`` with ``row`` = flipped
world y, ``col`` = world x, ``depth`` = world z (up) — identical to the
reference's map convention so coordinate semantics match exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.ops.scatter import trilinear_scatter_update


@dataclasses.dataclass(frozen=True)
class VoxelMap:
    """Voxel grid state: features + per-axis bin edges.

    ``bins_*`` hold the world positions of voxel boundaries, recomputed on
    ``reset`` when the map is re-centred on a new origin (reference:
    mass/nn/base_projection_layer.py:162-235).
    """

    data: jax.Array    # [H, W, D, F]
    bins_x: jax.Array  # [W + 1]
    bins_y: jax.Array  # [H + 1]
    bins_z: jax.Array  # [D + 1]
    geometry: MapGeometry

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @staticmethod
    def create(geometry: MapGeometry,
               origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
               dtype=jnp.float32) -> "VoxelMap":
        """Fresh zeroed map centred on ``origin`` = (x, y, z) world."""
        g = geometry
        ox, oy, oz = (jnp.asarray(v, jnp.float32) for v in origin)
        return VoxelMap(
            data=jnp.zeros((g.map_height, g.map_width,
                            g.map_depth, g.feature_size), dtype),
            bins_x=G.uniform_bins(ox, g.map_width, g.grid_resolution),
            bins_y=G.uniform_bins(oy, g.map_height, g.grid_resolution),
            bins_z=G.uniform_bins(oz, g.map_depth, g.grid_resolution),
            geometry=g)

    def reset(self, origin) -> "VoxelMap":
        """Zero the features and re-centre the grid on a new world origin
        (reference: mass/nn/base_projection_layer.py:183-235)."""
        g = self.geometry
        origin = jnp.asarray(origin, jnp.float32)
        return VoxelMap(
            data=jnp.zeros_like(self.data),
            bins_x=G.uniform_bins(origin[0], g.map_width,
                                  g.grid_resolution),
            bins_y=G.uniform_bins(origin[1], g.map_height,
                                  g.grid_resolution),
            bins_z=G.uniform_bins(origin[2], g.map_depth,
                                  g.grid_resolution),
            geometry=g)

    # ------------------------------------------------------------------
    # the hot path
    # ------------------------------------------------------------------

    def update(self, rays: jax.Array, position: jax.Array, yaw: jax.Array,
               elevation: jax.Array, depth: jax.Array,
               features: jax.Array, min_ray_depth: float = 0.0,
               max_ray_depth: float = 10.0) -> "VoxelMap":
        """Project one RGB-D frame's features into the grid.

        Composes orient → bin → trilinear scatter into one jittable step
        (reference: mass/nn/base_projection_layer.py:282-343).

        Args:
          rays: camera-frame ray directions ``[h, w, 3]``
            (``geometry.camera_rays``), a trace-time constant.
          position: agent/camera origin, world ``[3]`` (x, y, z-up).
          yaw / elevation: camera orientation, radians, scalars.
          depth: ``[h, w, 1]`` ray lengths.
          features: ``[fh, fw, F]`` feature image; integer-upsampled to
            the ray grid if smaller.
        """
        h, w = rays.shape[0], rays.shape[1]
        features = G.upsample_features(features, h, w)
        oriented = G.orient_rays(rays, yaw, elevation)
        points = G.bin_rays(self.bins_x, self.bins_y, self.bins_z,
                            position, oriented, depth,
                            min_ray_depth=min_ray_depth,
                            max_ray_depth=max_ray_depth)
        data = trilinear_scatter_update(
            self.data, points, features,
            self.geometry.interpolation_weight)
        return dataclasses.replace(self, data=data)

    # ------------------------------------------------------------------
    # rendering / coordinate transforms
    # ------------------------------------------------------------------

    def top_down(self, z_start: int = 0, z_stop: int = 32) -> jax.Array:
        """Feature of the top-most non-empty voxel per (row, col) within a
        depth slice; zero vector where the column is empty (reference:
        mass/nn/base_projection_layer.py:345-379)."""
        fmap = self.data[:, :, z_start:z_stop]
        mask = jnp.any(fmap != 0, axis=-1)
        # index of the last occupied z: cumsum peaks there, masked argmax
        idx = jnp.argmax(jnp.cumsum(mask, axis=-1) * mask, axis=-1)
        return jnp.take_along_axis(
            fmap, idx[..., None, None], axis=-2)[..., 0, :]

    def occupancy_mask(self, z_start: int = 0, z_stop: int = 32,
                       threshold: float = 0.0) -> jax.Array:
        """[H, W] bool — any voxel in the slice has L1 feature norm above
        threshold (reference: mass/navigation_policy.py:204-217)."""
        sl = self.data[:, :, z_start:z_stop]
        return jnp.any(
            jnp.sum(jnp.abs(sl), axis=-1) > threshold, axis=-1)

    def _world_lower_upper(self):
        lower = jnp.stack([(self.bins_x[0] + self.bins_x[1]) / 2,
                           (self.bins_y[0] + self.bins_y[1]) / 2,
                           (self.bins_z[0] + self.bins_z[1]) / 2])
        upper = jnp.stack([(self.bins_x[-1] + self.bins_x[-2]) / 2,
                           (self.bins_y[-1] + self.bins_y[-2]) / 2,
                           (self.bins_z[-1] + self.bins_z[-2]) / 2])
        return lower, upper

    def clamp_to_world(self, coords) -> jax.Array:
        """Clamp world xyz (or xy) into the span of voxel-centre extrema
        (reference: mass/nn/base_projection_layer.py:381-416)."""
        coords = jnp.asarray(coords, jnp.float32)
        lower, upper = self._world_lower_upper()
        k = coords.shape[-1]
        return jnp.clip(coords, lower[:k], upper[:k])

    def clamp_to_map(self, coords) -> jax.Array:
        """Clamp map xyz (or xy) cell coordinates into the grid
        (reference: mass/nn/base_projection_layer.py:418-450)."""
        g = self.geometry
        coords = jnp.asarray(coords)
        upper = jnp.asarray(
            [g.map_width - 1, g.map_height - 1, g.map_depth - 1],
            coords.dtype)
        return jnp.clip(coords, 0, upper[:coords.shape[-1]])

    def map_to_world(self, coords) -> jax.Array:
        """Map cell coords (xyz order, float) -> world, interpolating
        between voxel-centre positions; the y axis reads the flipped
        midpoint table (reference:
        mass/nn/base_projection_layer.py:452-511)."""
        coords = self.clamp_to_map(
            jnp.asarray(coords, jnp.float32)).astype(jnp.float32)
        floored = jnp.floor(coords)
        idx = floored.astype(jnp.int32)

        mid_x = (self.bins_x[:-1] + self.bins_x[1:]) / 2
        mid_y = jnp.flip((self.bins_y[:-1] + self.bins_y[1:]) / 2)
        mid_z = (self.bins_z[:-1] + self.bins_z[1:]) / 2

        def _interp(mids, i, frac):
            left = mids[i]
            right = mids[jnp.clip(i + 1, 0, mids.shape[0] - 1)]
            return left + (right - left) * frac

        frac = coords - floored
        out = [_interp(mid_x, idx[..., 0], frac[..., 0]),
               _interp(mid_y, idx[..., 1], frac[..., 1])]
        if coords.shape[-1] == 3:
            out.append(_interp(mid_z, idx[..., 2], frac[..., 2]))
        return jnp.stack(out, axis=-1)

    def world_to_map(self, coords) -> jax.Array:
        """World xyz (or xy) -> integer map cell coords, y flipped
        (reference: mass/nn/base_projection_layer.py:513-547)."""
        coords = self.clamp_to_world(coords)
        ix = G.bucketize(coords[..., 0], self.bins_x)
        iy = (self.bins_y.shape[0] - 2 -
              G.bucketize(coords[..., 1], self.bins_y))
        out = [ix, iy]
        if coords.shape[-1] == 3:
            out.append(G.bucketize(coords[..., 2], self.bins_z))
        return jnp.stack(out, axis=-1)


jax.tree_util.register_dataclass(
    VoxelMap,
    data_fields=["data", "bins_x", "bins_y", "bins_z"],
    meta_fields=["geometry"])
