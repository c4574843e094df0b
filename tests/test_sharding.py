"""Multi-device sharding tests on the virtual 8-device CPU mesh:
row-sharded voxel updates must agree with the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.parallel import make_mesh, shard_voxelmap, sharded_update_fn
from tests import reference_impl as R

GEO = MapGeometry(map_height=32, map_width=20, map_depth=8,
                  feature_size=3, grid_resolution=0.1, layout="vmajor")
CAM = dict(h=9, w=11, f=7.0)


def _frames(n, rng):
    out = []
    for _ in range(n):
        out.append((
            rng.uniform(0.05, 1.6, (CAM["h"], CAM["w"], 1)).astype(
                np.float32),
            rng.uniform(0, 1, (CAM["h"], CAM["w"], 3)).astype(np.float32),
            rng.uniform(-0.3, 0.3, 3).astype(np.float32),
            np.float32(rng.uniform(-np.pi, np.pi)),
            np.float32(rng.uniform(-0.8, 0.2))))
    return out


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_update_matches_single_device(n_shards):
    if jax.device_count() < n_shards:
        pytest.skip("not enough devices")
    mesh = make_mesh((n_shards,), ("map",))
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))

    vm_ref = VoxelMap.create(GEO, (0.1, -0.2, 0.0))
    vm_sh = shard_voxelmap(VoxelMap.create(GEO, (0.1, -0.2, 0.0)), mesh)
    update = sharded_update_fn(mesh, GEO)

    rng = np.random.RandomState(11)
    for depth, feats, pos, yaw, elev in _frames(3, rng):
        vm_ref = vm_ref.update(rays, jnp.asarray(pos), yaw, elev,
                               jnp.asarray(depth), jnp.asarray(feats))
        vm_sh = update(vm_sh, rays, jnp.asarray(pos), yaw, elev,
                       jnp.asarray(depth), jnp.asarray(feats))

    np.testing.assert_allclose(np.asarray(vm_sh.grid()),
                               np.asarray(vm_ref.grid()), atol=1e-5)
    assert np.asarray(vm_sh.data).any()


def test_data_parallel_batch_of_maps():
    """Episode batch sharded over 'data', map rows over 'map'."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh((2, 4), ("data", "map"))
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))

    b = 4
    rng = np.random.RandomState(12)
    frames = _frames(b, rng)
    depth = jnp.asarray(np.stack([f[0] for f in frames]))
    feats = jnp.asarray(np.stack([f[1] for f in frames]))
    pos = jnp.asarray(np.stack([f[2] for f in frames]))
    yaw = jnp.asarray(np.stack([f[3] for f in frames]))
    elev = jnp.asarray(np.stack([f[4] for f in frames]))

    def single(data, p, y, e, d, f):
        vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
        vm = VoxelMap(data=data, bins_x=vm.bins_x, bins_y=vm.bins_y,
                      bins_z=vm.bins_z, geometry=GEO)
        return vm.update(rays, p, y, e, d, f).data

    batched = jax.jit(jax.vmap(single))
    data0 = jnp.zeros((b, GEO.num_voxels, GEO.feature_size))
    sharding = NamedSharding(mesh, P("data", "map", None))
    data0_sh = jax.device_put(data0, sharding)
    out = batched(data0_sh, pos, yaw, elev, depth, feats)

    ref = np.asarray(batched(data0, pos, yaw, elev, depth, feats))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    assert ref.any()


def test_batched_mapper_matches_single_episodes():
    """The batched multi-episode service equals per-episode updates."""
    from mass_tpu.parallel import BatchedMapper
    from mass_tpu.config import CameraConfig

    geo = MapGeometry(map_height=32, map_width=20, map_depth=8,
                      feature_size=5, grid_resolution=0.1,
                      layout="vmajor")
    cam = CameraConfig(height=CAM["h"], width=CAM["w"])
    # CameraConfig computes focal from vfov; match test rays by picking
    # vfov giving f=7: f = h/2/tan(v/2) -> tan(v/2) = h/2/7
    import math
    vfov = math.degrees(2 * math.atan(CAM["h"] / 2 / CAM["f"]))
    cam = CameraConfig(height=CAM["h"], width=CAM["w"],
                       vertical_fov_degrees=vfov)

    mesh = make_mesh((2, 4), ("data", "map")) if \
        jax.device_count() >= 8 else None
    b = 4
    mapper = BatchedMapper(b, cam, geo, mesh=mesh)
    origins = np.asarray([[0.1 * i, -0.05 * i, 0.0] for i in range(b)],
                         np.float32)
    for i in range(b):
        mapper.reset(i, origins[i])

    rng = np.random.RandomState(3)
    singles = [VoxelMap.create(geo, tuple(origins[i]))
               for i in range(b)]
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))

    for _ in range(2):
        frames = _frames(b, rng)
        depth = np.stack([f[0] for f in frames])
        classes = rng.randint(0, 5, (b, CAM["h"], CAM["w"]))
        pos = np.stack([f[2] for f in frames])
        yaw = np.stack([f[3] for f in frames])
        elev = np.stack([f[4] for f in frames])
        mapper.step(pos, yaw, elev, depth, classes)
        for i in range(b):
            onehot = np.eye(5, dtype=np.float32)[classes[i]]
            singles[i] = singles[i].update(
                rays, jnp.asarray(pos[i]), yaw[i], elev[i],
                jnp.asarray(depth[i]), jnp.asarray(onehot))

    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(mapper.voxel_map(i).grid()),
            np.asarray(singles[i].grid()), atol=1e-5)
        assert np.asarray(singles[i].grid()).any()
