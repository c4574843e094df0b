"""Parity of the voxel-major one-hot update path (the host/CPU layout)
against the channel-major path: identical EMA-blend algebra, sparse
application (ops/scatter.apply_onehot_vmajor).

The agent's one-hot maps resolve to vmajor automatically on non-TPU
backends (core/voxelmap._resolved_layout), so these tests pin that the
layout switch is semantically invisible (reference semantics:
mass/utils/projection.py:233-351).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap, apply_onehot_group

GEO_KW = dict(map_height=24, map_width=20, map_depth=8,
              feature_size=5, grid_resolution=0.1,
              interpolation_weight=0.5)
CAM = dict(h=9, w=11, f=7.0)
ORIGIN = (0.15, -0.1, 0.05)


def _frames(rng, n):
    depths = rng.uniform(0.05, 1.4,
                         (n, CAM["h"], CAM["w"], 1)).astype(np.float32)
    depths[:, 0, 0, 0] = 50.0   # out-of-range -> discard slot
    depths[:, 1, 1, 0] = 0.0
    classes = rng.randint(0, GEO_KW["feature_size"],
                          (n, CAM["h"], CAM["w"])).astype(np.int32)
    poses = [dict(position=rng.uniform(-0.2, 0.2, 3).astype(np.float32),
                  yaw=np.float32(rng.uniform(-np.pi, np.pi)),
                  elevation=np.float32(rng.uniform(-0.9, 0.3)))
             for _ in range(n)]
    return depths, classes, poses


def _pair():
    vm_c = VoxelMap.create(MapGeometry(layout="cmajor", **GEO_KW), ORIGIN)
    vm_v = VoxelMap.create(MapGeometry(layout="vmajor", **GEO_KW), ORIGIN)
    rays = G.camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    return vm_c, vm_v, rays


def _grids_close(vm_a, vm_b, atol=1e-6):
    np.testing.assert_allclose(np.asarray(vm_a.grid()),
                               np.asarray(vm_b.grid()), atol=atol)


def test_auto_layout_is_vmajor_off_tpu():
    # the whole test suite runs on the forced-CPU backend (conftest)
    vm = VoxelMap.create(MapGeometry(**GEO_KW), ORIGIN)
    assert vm.layout == "vmajor"
    assert vm.data.shape == (vm.geometry.num_voxels,
                             GEO_KW["feature_size"])


def test_update_classes_vmajor_matches_cmajor():
    rng = np.random.RandomState(7)
    depths, classes, poses = _frames(rng, 3)
    vm_c, vm_v, rays = _pair()
    for d, c, p in zip(depths, classes, poses):
        args = (rays, jnp.asarray(p["position"]), p["yaw"],
                p["elevation"], jnp.asarray(d), jnp.asarray(c))
        vm_c = vm_c.update_classes(*args)
        vm_v = vm_v.update_classes(*args)
    _grids_close(vm_c, vm_v)
    assert float(np.abs(np.asarray(vm_v.grid())).sum()) > 0


def test_frames_fold_vmajor_matches_cmajor():
    rng = np.random.RandomState(11)
    depths, classes, poses = _frames(rng, 4)
    vm_c, vm_v, rays = _pair()
    args = (rays,
            jnp.asarray(np.stack([p["position"] for p in poses])),
            jnp.asarray(np.stack([p["yaw"] for p in poses])),
            jnp.asarray(np.stack([p["elevation"] for p in poses])),
            jnp.asarray(depths), jnp.asarray(classes))
    vm_c = vm_c.update_classes_frames(*args)
    vm_v = vm_v.update_classes_frames(*args)
    _grids_close(vm_c, vm_v)


def test_group_update_vmajor_matches_cmajor():
    rng = np.random.RandomState(13)
    depths, classes, poses = _frames(rng, 1)
    vm_c, vm_v, rays = _pair()
    occ_geo = dict(GEO_KW, feature_size=1, interpolation_weight=0.25)
    occ_c = VoxelMap.create(MapGeometry(layout="cmajor", **occ_geo),
                            ORIGIN)
    occ_v = VoxelMap.create(MapGeometry(layout="vmajor", **occ_geo),
                            ORIGIN)
    p = poses[0]
    ids, w = vm_c.contributions(rays, jnp.asarray(p["position"]),
                                p["yaw"], p["elevation"],
                                jnp.asarray(depths[0]))
    cls = jnp.asarray(classes[0])
    occ_cls = jnp.zeros_like(cls)
    out_c = apply_onehot_group([occ_c, vm_c], ids, w, [occ_cls, cls])
    out_v = apply_onehot_group([occ_v, vm_v], ids, w, [occ_cls, cls])
    for a, b in zip(out_c, out_v):
        _grids_close(a, b)


def test_vmajor_all_invalid_is_noop():
    vm_c, vm_v, rays = _pair()
    rng = np.random.RandomState(5)
    before = np.asarray(vm_v.data).copy()
    depth = np.full((CAM["h"], CAM["w"], 1), 99.0, np.float32)
    cls = rng.randint(0, GEO_KW["feature_size"],
                      (CAM["h"], CAM["w"])).astype(np.int32)
    vm_v = vm_v.update_classes(rays, jnp.zeros(3), jnp.float32(0.1),
                               jnp.float32(-0.1), jnp.asarray(depth),
                               jnp.asarray(cls))
    np.testing.assert_array_equal(np.asarray(vm_v.data), before)


def test_vmajor_nonzero_state_blend():
    """EMA blend on a non-empty map: run two frames so touched voxels
    carry prior mass, then confirm against cmajor exactly."""
    rng = np.random.RandomState(17)
    depths, classes, poses = _frames(rng, 2)
    vm_c, vm_v, rays = _pair()
    # seed both maps with identical non-trivial state
    grid = rng.uniform(0, 1, (GEO_KW["map_height"], GEO_KW["map_width"],
                              GEO_KW["map_depth"],
                              GEO_KW["feature_size"])).astype(np.float32)
    vm_c = vm_c.with_grid(jnp.asarray(grid))
    vm_v = vm_v.with_grid(jnp.asarray(grid))
    for d, c, p in zip(depths, classes, poses):
        args = (rays, jnp.asarray(p["position"]), p["yaw"],
                p["elevation"], jnp.asarray(d), jnp.asarray(c))
        vm_c = vm_c.update_classes(*args)
        vm_v = vm_v.update_classes(*args)
    _grids_close(vm_c, vm_v)
