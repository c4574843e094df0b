"""Row-sharded voxel maps over a device mesh.

The voxel grid shards cleanly over map rows: each device owns the
voxel-major slab ``[V/n, F]`` covering ``H/n`` map rows.  A frame update
is collective-free — the (small) frame is replicated, every device runs
the same unproject/bin math, re-bases global corner ids into its slab,
and masks out-of-slab corners to the discard slot.  Scattered points
thus "route themselves" by bin index; no all-to-all is needed because
the frame is tiny (~200 KB) next to the map (~3 GB).

This is the TPU-native replacement for the reference's single-GPU map
residency (and the scaling story the reference lacks): many episodes'
maps stay device-resident simultaneously via a leading ``data``-sharded
episode batch (vmap over this update).

Sharded maps use the ``vmajor`` ``[V, F]`` storage (a partitionable
first axis); the single-device hot path prefers ``cmajor`` flat storage
(see core/voxelmap.py) — multi-chip users trade some lane padding for a
clean partition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap, resolved_layout
from mass_tpu.ops.scatter import (apply_dense_rows, apply_onehot_cmajor,
                                  corner_contributions)


def shard_voxelmap(vm: VoxelMap, mesh: Mesh,
                   axis: str = "map") -> VoxelMap:
    """Place a VoxelMap with data row-sharded over ``axis`` and bins
    replicated.  vmajor ``[V, F]`` shards its leading (voxel) axis;
    cmajor ``[Fpad, V]`` shards its trailing (voxel) axis — both
    partition the map by voxel id, so the per-device update body only
    differs in storage orientation."""
    if vm.layout == "vmajor":
        data_sh = NamedSharding(mesh, P(axis, None))
    else:
        data_sh = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    return VoxelMap(
        data=jax.device_put(vm.data, data_sh),
        bins_x=jax.device_put(vm.bins_x, rep),
        bins_y=jax.device_put(vm.bins_y, rep),
        bins_z=jax.device_put(vm.bins_z, rep),
        geometry=vm.geometry)


def _slab_update(data_slab, bins_x, bins_y, bins_z, rays, position, yaw,
                 elevation, depth, features, *, geometry: MapGeometry,
                 axis: str, onehot: bool, min_ray_depth: float,
                 max_ray_depth: float):
    """Per-device body: update one ``[V/n, F]`` slab from a replicated
    frame.  ``features`` is an ``[h, w]`` class-id image when ``onehot``
    else an ``[h, w, F]`` feature image."""
    g = geometry
    h, w = rays.shape[0], rays.shape[1]
    if onehot:
        classes = G.upsample_features(features[..., None], h, w)[..., 0]
        feats = jax.nn.one_hot(classes.reshape(-1), g.feature_size)
    else:
        feats = G.upsample_features(features, h, w).reshape(
            -1, g.feature_size)
    oriented = G.orient_rays(rays, yaw, elevation)
    points = G.bin_rays(bins_x, bins_y, bins_z, position, oriented, depth,
                        min_ray_depth=min_ray_depth,
                        max_ray_depth=max_ray_depth)
    ids, weights = corner_contributions(
        points, (g.map_height, g.map_width, g.map_depth))

    slab_voxels = data_slab.shape[0]
    lo = jax.lax.axis_index(axis) * slab_voxels
    local = ids - lo
    local = jnp.where((local >= 0) & (local < slab_voxels),
                      local, slab_voxels)
    return apply_dense_rows(data_slab, local, weights, feats,
                            g.interpolation_weight)


def _cmajor_slab_update(data_slab, bins_x, bins_y, bins_z, rays,
                        position, yaw, elevation, depth, classes, *,
                        geometry: MapGeometry, axis: str,
                        min_ray_depth: float, max_ray_depth: float):
    """Per-device body for the PRODUCTION channel-major layout: update
    one ``[Fpad, V/n]`` column slab from a replicated frame via the
    cmajor XLA fallback (ops/scatter.apply_onehot_cmajor).  Same
    self-routing as the vmajor body: global corner ids re-base into the
    local column range, out-of-slab corners mask to the discard slot
    (``apply_onehot_cmajor`` drops ids >= V/n)."""
    g = geometry
    h, w = rays.shape[0], rays.shape[1]
    cls = G.upsample_features(classes[..., None], h, w)[..., 0]
    oriented = G.orient_rays(rays, yaw, elevation)
    points = G.bin_rays(bins_x, bins_y, bins_z, position, oriented,
                        depth, min_ray_depth=min_ray_depth,
                        max_ray_depth=max_ray_depth)
    ids, weights = corner_contributions(
        points, (g.map_height, g.map_width, g.map_depth))

    slab_voxels = data_slab.shape[1]
    lo = jax.lax.axis_index(axis) * slab_voxels
    local = ids - lo
    local = jnp.where((local >= 0) & (local < slab_voxels),
                      local, slab_voxels)
    return apply_onehot_cmajor(data_slab, local, weights,
                               cls.reshape(-1),
                               g.interpolation_weight)


def sharded_update_fn(mesh: Mesh, geometry: MapGeometry,
                      axis: str = "map", onehot: bool = False,
                      min_ray_depth: float = 0.0,
                      max_ray_depth: float = 10.0):
    """Build a jitted ``(vm, rays, position, yaw, elevation, depth,
    features) -> vm`` with ``vm.data`` row-sharded over ``axis``.

    ``features`` is an ``[h, w]`` class-id image when ``onehot`` (the
    occupancy/semantic path) else an ``[h, w, F]`` feature image.  Other
    mesh axes (e.g. ``data``) stay free for vmapped episode batches
    around this function.

    cmajor geometries shard the ``[Fpad, V]`` slab over COLUMNS (voxel
    ids) with the same replicated-frame self-routing — the production
    TPU layout is shard-testable without a layout switch (one-hot path
    only; dense feature maps use vmajor when sharded).
    """
    if resolved_layout(geometry) == "cmajor":
        assert onehot, "sharded cmajor supports the one-hot path only"
        body = functools.partial(
            _cmajor_slab_update, geometry=geometry, axis=axis,
            min_ray_depth=min_ray_depth, max_ray_depth=max_ray_depth)
        data_spec = P(None, axis)
    else:
        body = functools.partial(
            _slab_update, geometry=geometry, axis=axis, onehot=onehot,
            min_ray_depth=min_ray_depth, max_ray_depth=max_ray_depth)
        data_spec = P(axis, None)

    sm = shard_map(
        body, mesh=mesh,
        in_specs=(data_spec,) + (P(),) * 9,
        out_specs=data_spec,
        check_vma=False)

    @jax.jit
    def update(vm: VoxelMap, rays, position, yaw, elevation, depth,
               features):
        data = sm(vm.data, vm.bins_x, vm.bins_y, vm.bins_z, rays,
                  position, yaw, elevation, depth, features)
        return VoxelMap(data=data, bins_x=vm.bins_x, bins_y=vm.bins_y,
                        bins_z=vm.bins_z, geometry=vm.geometry)

    return update
