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
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.ops.scatter import apply_dense_rows, corner_contributions


def shard_voxelmap(vm: VoxelMap, mesh: Mesh,
                   axis: str = "map") -> VoxelMap:
    """Place a vmajor VoxelMap with data row-sharded over ``axis`` and
    bins replicated."""
    assert vm.layout == "vmajor", (
        "sharded maps use vmajor storage; create with "
        "MapGeometry(layout='vmajor')")
    data_sh = NamedSharding(mesh, P(axis, None))
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
    """
    body = functools.partial(
        _slab_update, geometry=geometry, axis=axis, onehot=onehot,
        min_ray_depth=min_ray_depth, max_ray_depth=max_ray_depth)

    sm = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None),) + (P(),) * 9,
        out_specs=P(axis, None),
        check_vma=False)

    @jax.jit
    def update(vm: VoxelMap, rays, position, yaw, elevation, depth,
               features):
        data = sm(vm.data, vm.bins_x, vm.bins_y, vm.bins_z, rays,
                  position, yaw, elevation, depth, features)
        return VoxelMap(data=data, bins_x=vm.bins_x, bins_y=vm.bins_y,
                        bins_z=vm.bins_z, geometry=vm.geometry)

    return update
