"""Fleet mapping: many episodes' one-hot maps updated by ONE kernel
launch per step.

The reference evaluates episodes one-per-GPU-process with zero sharing
(reference: agent.py:795-800 --start-task/--every-tasks).  The TPU-
native serving shape stores B episodes' maps as SLABS of a single
buffer — ``[F, B*V]`` channel-major on TPU (Pallas span kernels),
``[B*V, F]`` voxel-major on host backends (sparse row updates), the
same backend rule as single maps (core.voxelmap.resolved_layout).
Per-episode frames bin against their own episode's grid (origins
differ), corner ids re-base by ``episode * V``, and the whole fleet's
records feed the SAME splat kernels that serve the single-episode hot
path (ops/pallas_splat.py) — one sort + one launch per step for every
episode and every same-grid map.

Discard ids re-base to the global discard slot ``B * V`` so an invalid
pixel of episode e can never leak into episode e+1's first voxel.

This composes with parallel/sharding.py: the flat ``B*V`` axis is the
natural multi-chip partition (slab(s) per device, frames replicated,
records self-route by id).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import (VoxelMap, apply_onehot_group,
                                    resolved_layout)
from mass_tpu.ops.scatter import corner_contributions


class FleetMaps:
    """B episodes x named one-hot maps (same camera + grid, shared
    binning), each map family one slab buffer (``[F_m, B*V]`` cmajor /
    ``[B*V, F_m]`` vmajor, resolved per family by the backend rule —
    see the module docstring).

    Args:
      batch: number of episodes B.
      camera: shared camera intrinsics.
      geometry: per-episode map geometry (feature_size ignored — each
        family's layout resolves from ITS channel count).
      feature_sizes: name -> channel count, e.g.
        ``{"semantic0": 54, "occupancy": 1}``.  Maps named
        ``occupancy*`` take implicit class 0 (no classes input needed).
      mesh / mesh_axis: (optional) row-shard every family's slab over
        this device-mesh axis — the ``B*V`` voxel axis is the natural
        multi-chip partition (module docstring).  Forces vmajor slabs;
        the jitted step/reset keep the placement (donated buffers), so
        one ``device_put`` at construction shards the whole lifetime.
      dense_sizes / backbone / stride: dense-feature families (the
        ResNet maps of ``--use-feature-matching``; reference:
        mass/nn/applications/resnet_projection_layer.py:62-141): each
        episode's RGB frame runs through ``backbone`` at 1/stride
        resolution and the embeddings splat into vmajor ``[B*V, F]``
        slabs via their own binning pass (``update_dense``), batched
        over the fleet in one dispatch.
    """

    def __init__(self, batch: int, camera: CameraConfig,
                 geometry: MapGeometry,
                 feature_sizes: Dict[str, int],
                 mesh=None, mesh_axis: str = "map",
                 dense_sizes: Dict[str, int] = None,
                 backbone=None, stride: int = 4):
        self.batch = batch
        self.camera = camera
        self.base_geometry = geometry
        self.names: List[str] = list(feature_sizes)
        self.dense_names: List[str] = list(dense_sizes or {})
        self.mesh = mesh
        self.rays = G.camera_rays(camera.height, camera.width,
                                  camera.focal_length,
                                  camera.focal_length)
        self._stride = stride
        self._backbone = backbone
        if self.dense_names:
            assert backbone is not None, \
                "dense feature families need a backbone"
            dcam = camera.downsample(stride)
            self.dense_rays = G.camera_rays(
                dcam.height, dcam.width, dcam.focal_length,
                dcam.focal_length)

        g = geometry
        self._episode_voxels = g.num_voxels
        # each family's slab layout follows the backend like single
        # maps do (resolved from the FAMILY's channel count, not the
        # base geometry's ignored feature_size) — either way the fleet
        # buffer is just a taller map (B*H rows of the same grid), so
        # VoxelMap storage/kernel routing applies unchanged
        all_sizes = {**feature_sizes, **(dense_sizes or {})}
        self.layouts = {
            name: resolved_layout(dataclasses.replace(
                g, feature_size=f))
            for name, f in feature_sizes.items()}
        # dense-feature families are always vmajor (F lane-aligned)
        for name in (dense_sizes or {}):
            self.layouts[name] = "vmajor"
        if mesh is not None:
            # sharded slabs need the partitionable [B*V, F] axis
            n = mesh.shape[mesh_axis]
            assert (batch * g.num_voxels) % n == 0, (
                f"fleet slab rows {batch * g.num_voxels} must divide "
                f"over the {n}-device '{mesh_axis}' axis")
            self.layouts = {name: "vmajor" for name in self.layouts}
        self._fleet_geoms = {
            name: dataclasses.replace(
                g, map_height=g.map_height * batch, feature_size=f,
                layout=self.layouts[name])
            for name, f in all_sizes.items()}
        self._episode_geoms = {
            name: dataclasses.replace(g, feature_size=f,
                                      layout=self.layouts[name])
            for name, f in all_sizes.items()}
        self.buffers = {
            name: VoxelMap.create(fg).data
            for name, fg in self._fleet_geoms.items()}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(mesh_axis, None))
            self.buffers = {name: jax.device_put(buf, sh)
                            for name, buf in self.buffers.items()}

        zeros = jnp.zeros((batch,), jnp.float32)
        self.bins_x = jax.vmap(
            lambda o: G.uniform_bins(o, g.map_width,
                                     g.grid_resolution))(zeros)
        self.bins_y = jax.vmap(
            lambda o: G.uniform_bins(o, g.map_height,
                                     g.grid_resolution))(zeros)
        self.bins_z = jax.vmap(
            lambda o: G.uniform_bins(o, g.map_depth,
                                     g.grid_resolution))(zeros)

        self._step = self._build_step()
        self._dense_step = (self._build_dense_step()
                            if self.dense_names else None)
        self._reset_slab = self._build_reset()
        # per-episode reset generation (see maps/layers._BaseMap
        # .bins_epoch): host midpoint caches key on this
        self._bins_epochs = [0] * batch

    # ------------------------------------------------------------ build

    def _build_step(self):
        rays = self.rays
        g = self.base_geometry
        B = self.batch
        V = self._episode_voxels
        names = self.names
        h, w = rays.shape[0], rays.shape[1]
        fleet_vms = {n: VoxelMap.create(fg)
                     for n, fg in self._fleet_geoms.items()}

        @functools.partial(jax.jit, donate_argnums=0)
        def step(buffers, bins_x, bins_y, bins_z, positions, yaws,
                 elevations, depths, classes, active):
            def per_episode(bx, by, bz, p, y, e, d):
                oriented = G.orient_rays(rays, y, e)
                pts = G.bin_rays(bx, by, bz, p, oriented, d,
                                 resolution=g.grid_resolution)
                return corner_contributions(
                    pts, (g.map_height, g.map_width, g.map_depth))

            ids, weights = jax.vmap(per_episode)(
                bins_x, bins_y, bins_z, positions, yaws, elevations,
                depths)                                   # [B, 8N]
            offsets = (jnp.arange(B, dtype=ids.dtype) * V)[:, None]
            gids = jnp.where(ids < V, ids + offsets, B * V)
            # the apply/sort contract is corner-major records (pixel of
            # record k is k % num_pixels): lift the per-episode corner
            # axis to the front so classes stay a flat [B*N] image batch
            n = gids.shape[1] // 8
            gids = gids.reshape(B, 8, n).transpose(1, 0, 2)  # [8, B, n]
            gw = weights.reshape(B, 8, n).transpose(1, 0, 2).reshape(-1)

            vms, cls_flat = [], []
            for name in names:
                vms.append(dataclasses.replace(fleet_vms[name],
                                               data=buffers[name]))
                if name in classes:
                    up = jax.vmap(lambda c: G.upsample_features(
                        c[..., None], h, w)[..., 0])(classes[name])
                else:                     # occupancy: implicit class 0
                    up = jnp.zeros((B, h, w), jnp.int32)
                cls_flat.append(up.reshape(-1))

            if active is None:
                out = apply_onehot_group(vms, gids.reshape(-1), gw,
                                         cls_flat)
            else:
                # per-(episode, family) masks: inactive episodes' records
                # re-route to the discard slot PER FAMILY.  The multi-map
                # kernel shares W/S2 across families (its EMA multiplier
                # would decay inactive maps), so masked steps run one
                # single-family launch per family instead.
                out = []
                for name, vm, cls in zip(names, vms, cls_flat):
                    mask = active[name][None, :, None]     # [1, B, 1]
                    fam_ids = jnp.where(mask, gids, B * V).reshape(-1)
                    out.append(vm.apply_onehot(fam_ids, gw, cls))
            return {name: vm.data for name, vm in zip(names, out)}

        return step

    def _build_dense_step(self):
        """One dispatch: every live episode's RGB through the backbone,
        embeddings splatted into the dense-family slabs (the fleet
        analogue of maps/layers.FeatureMap.update_fn; reference:
        resnet_projection_layer.py:159-213)."""
        rays = self.dense_rays
        g = self.base_geometry
        B = self.batch
        V = self._episode_voxels
        names = list(self.dense_names)
        backbone = self._backbone
        k = self._stride
        fleet_vms = {n: VoxelMap.create(self._fleet_geoms[n])
                     for n in names}
        from mass_tpu.ops.scatter import apply_dense_rows

        @functools.partial(jax.jit, donate_argnums=0)
        def step(buffers, bins_x, bins_y, bins_z, positions, yaws,
                 elevations, depths, rgbs, active):
            def per_episode(bx, by, bz, p, y, e, d, rgb):
                feats = backbone(rgb)
                sub = d[k // 2::k, k // 2::k]
                oriented = G.orient_rays(rays, y, e)
                pts = G.bin_rays(bx, by, bz, p, oriented, sub,
                                 resolution=g.grid_resolution)
                ids, w = corner_contributions(
                    pts, (g.map_height, g.map_width, g.map_depth))
                return ids, w, feats.reshape(-1, feats.shape[-1])

            ids, weights, feats = jax.vmap(per_episode)(
                bins_x, bins_y, bins_z, positions, yaws, elevations,
                depths, rgbs)                       # [B, 8n], [B, n, F]
            offsets = (jnp.arange(B, dtype=ids.dtype) * V)[:, None]
            gids = jnp.where(ids < V, ids + offsets, B * V)
            n = gids.shape[1] // 8
            # corner-major record order (record r's pixel = r % (B*n))
            gids = gids.reshape(B, 8, n).transpose(1, 0, 2)
            gw = weights.reshape(B, 8, n).transpose(1, 0, 2).reshape(-1)
            feats = feats.reshape(B * n, -1)

            out = {}
            for name in names:
                vm = dataclasses.replace(fleet_vms[name],
                                         data=buffers[name])
                fam_ids = gids
                if active is not None:
                    mask = active[name][None, :, None]
                    fam_ids = jnp.where(mask, gids, B * V)
                out[name] = apply_dense_rows(
                    vm.data, fam_ids.reshape(-1), gw, feats,
                    vm.geometry.interpolation_weight)
            return out

        return step

    def _build_reset(self):
        g = self.base_geometry
        V = self._episode_voxels

        layouts = dict(self.layouts)

        @functools.partial(jax.jit, donate_argnums=0)
        def reset(buffers, bins_x, bins_y, bins_z, episode, origin):
            out = {}
            for name, buf in buffers.items():
                if layouts[name] == "cmajor":
                    zero = jnp.zeros((buf.shape[0], V), buf.dtype)
                    out[name] = jax.lax.dynamic_update_slice(
                        buf, zero, (0, episode * V))
                else:
                    zero = jnp.zeros((V, buf.shape[1]), buf.dtype)
                    out[name] = jax.lax.dynamic_update_slice(
                        buf, zero, (episode * V, 0))
            bx = G.uniform_bins(origin[0], g.map_width,
                                g.grid_resolution)
            by = G.uniform_bins(origin[1], g.map_height,
                                g.grid_resolution)
            bz = G.uniform_bins(origin[2], g.map_depth,
                                g.grid_resolution)
            e = episode[None]
            return (out,
                    bins_x.at[e].set(bx[None]),
                    bins_y.at[e].set(by[None]),
                    bins_z.at[e].set(bz[None]))

        return reset

    # ------------------------------------------------------------- api

    def reset(self, episode: int, origin) -> None:
        """Zero one episode's slabs and re-centre its grid."""
        self.buffers, self.bins_x, self.bins_y, self.bins_z = \
            self._reset_slab(self.buffers, self.bins_x, self.bins_y,
                             self.bins_z, jnp.int32(episode),
                             jnp.asarray(origin, jnp.float32))
        self._bins_epochs[episode] += 1

    def bins_epoch(self, episode: int) -> int:
        return self._bins_epochs[episode]

    def update_batch(self, positions, yaws, elevations, depths,
                     classes: Dict[str, np.ndarray],
                     active: Dict[str, np.ndarray] = None) -> None:
        """Fold one frame per episode into every map, one dispatch.

        Args: ``positions [B, 3]``, ``yaws [B]``, ``elevations [B]``,
        ``depths [B, h, w, 1]``, ``classes`` name -> ``[B, ch, cw]``
        (omit occupancy-style maps); ``active`` (optional) name ->
        ``[B]`` bool — which episodes update which family this step
        (mixed-phase fleets; omitted = all active, fastest path).
        """
        if active is not None:
            active = {name: jnp.asarray(active[name], jnp.bool_)
                      for name in self.names}
        onehot = {n: self.buffers[n] for n in self.names}
        out = self._step(
            onehot, self.bins_x, self.bins_y, self.bins_z,
            jnp.asarray(positions, jnp.float32),
            jnp.asarray(yaws, jnp.float32),
            jnp.asarray(elevations, jnp.float32),
            jnp.asarray(depths, jnp.float32),
            {k: jnp.asarray(v, jnp.int32) for k, v in classes.items()},
            active)
        self.buffers = {**self.buffers, **out}

    def update_dense(self, positions, yaws, elevations, depths, rgbs,
                     active: Dict[str, np.ndarray] = None) -> None:
        """Fold one RGB frame per episode into every dense-feature
        family (backbone at 1/stride resolution, strided depth
        subsample) in one dispatch.  ``rgbs [B, h, w, 3]``; ``active``
        name -> ``[B]`` bool like :meth:`update_batch`."""
        assert self.dense_names, "no dense families configured"
        if active is not None:
            active = {name: jnp.asarray(active[name], jnp.bool_)
                      for name in self.dense_names}
        dense = {n: self.buffers[n] for n in self.dense_names}
        out = self._dense_step(
            dense, self.bins_x, self.bins_y, self.bins_z,
            jnp.asarray(positions, jnp.float32),
            jnp.asarray(yaws, jnp.float32),
            jnp.asarray(elevations, jnp.float32),
            jnp.asarray(depths, jnp.float32),
            jnp.asarray(rgbs, jnp.float32),
            active)
        self.buffers = {**self.buffers, **out}

    def view(self, name: str, episode: int) -> VoxelMap:
        """One episode's map as a standard VoxelMap (planner/matcher
        input; a device-side slice)."""
        V = self._episode_voxels
        buf = self.buffers[name]
        if self.layouts[name] == "cmajor":
            data = jax.lax.dynamic_slice(
                buf, (0, episode * V), (buf.shape[0], V))
        else:
            data = jax.lax.dynamic_slice(
                buf, (episode * V, 0), (V, buf.shape[1]))
        return VoxelMap(data=data,
                        bins_x=self.bins_x[episode],
                        bins_y=self.bins_y[episode],
                        bins_z=self.bins_z[episode],
                        geometry=self._episode_geoms[name])
