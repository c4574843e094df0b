"""Parity tests for VoxelMap update / rendering / coordinate transforms
against the NumPy oracle of the reference semantics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap
from tests import reference_impl as R

GEO = MapGeometry(map_height=24, map_width=20, map_depth=8,
                  feature_size=3, grid_resolution=0.1,
                  interpolation_weight=0.5)
CAM = dict(h=9, w=11, f=7.0)
ORIGIN = (0.15, -0.1, 0.05)


def _make_frame(rng, special_depths=True):
    depth = rng.uniform(0.05, 1.4,
                        size=(CAM["h"], CAM["w"], 1)).astype(np.float32)
    if special_depths:
        depth[0, 0, 0] = 50.0
        depth[1, 1, 0] = 0.0
    feats = rng.uniform(0, 1, size=(CAM["h"], CAM["w"],
                                    GEO.feature_size)).astype(np.float32)
    pose = dict(position=rng.uniform(-0.2, 0.2, 3).astype(np.float32),
                yaw=np.float32(rng.uniform(-np.pi, np.pi)),
                elevation=np.float32(rng.uniform(-0.9, 0.3)))
    return depth, feats, pose


def _ref_state():
    fmap = np.zeros((GEO.map_height, GEO.map_width, GEO.map_depth,
                     GEO.feature_size), np.float32)
    bx = R.ref_bins(ORIGIN[0], GEO.map_width, GEO.grid_resolution)
    by = R.ref_bins(ORIGIN[1], GEO.map_height, GEO.grid_resolution)
    bz = R.ref_bins(ORIGIN[2], GEO.map_depth, GEO.grid_resolution)
    return fmap, bx, by, bz


def _ref_apply(fmap, bx, by, bz, rays, depth, feats, pose):
    return R.ref_full_update(
        fmap, bx, by, bz, rays, pose["position"], pose["yaw"],
        pose["elevation"], depth, feats,
        interpolation_weight=GEO.interpolation_weight)


def test_bins_match_reference():
    vm = VoxelMap.create(GEO, ORIGIN)
    _, bx, by, bz = _ref_state()
    np.testing.assert_allclose(np.asarray(vm.bins_x), bx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.bins_y), by, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.bins_z), bz, atol=1e-6)


def test_single_update_parity():
    rng = np.random.RandomState(3)
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    depth, feats, pose = _make_frame(rng)

    fmap, bx, by, bz = _ref_state()
    _ref_apply(fmap, bx, by, bz, rays, depth, feats, pose)

    vm = VoxelMap.create(GEO, ORIGIN)
    vm = vm.update(jnp.asarray(rays), jnp.asarray(pose["position"]),
                   pose["yaw"], pose["elevation"],
                   jnp.asarray(depth), jnp.asarray(feats))

    assert np.any(fmap != 0), "oracle map should be non-empty"
    np.testing.assert_allclose(np.asarray(vm.grid()), fmap, atol=1e-4)


def test_sequential_updates_parity():
    """EMA blending across frames is order-dependent; five frames from a
    moving pose must still agree with the oracle."""
    rng = np.random.RandomState(4)
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    fmap, bx, by, bz = _ref_state()
    vm = VoxelMap.create(GEO, ORIGIN)
    jrays = jnp.asarray(rays)

    update = jax.jit(
        lambda m, p, y, e, d, f: m.update(jrays, p, y, e, d, f))

    for _ in range(5):
        depth, feats, pose = _make_frame(rng, special_depths=False)
        _ref_apply(fmap, bx, by, bz, rays, depth, feats, pose)
        vm = update(vm, jnp.asarray(pose["position"]), pose["yaw"],
                    pose["elevation"], jnp.asarray(depth),
                    jnp.asarray(feats))

    np.testing.assert_allclose(np.asarray(vm.grid()), fmap, atol=3e-4)


def test_update_all_invalid_is_noop():
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    depth = np.full((CAM["h"], CAM["w"], 1), 99.0, np.float32)
    feats = np.ones((CAM["h"], CAM["w"], GEO.feature_size), np.float32)
    vm = VoxelMap.create(GEO, ORIGIN)
    out = vm.update(jnp.asarray(rays), jnp.zeros(3), 0.0, 0.0,
                    jnp.asarray(depth), jnp.asarray(feats))
    np.testing.assert_array_equal(np.asarray(out.grid()), 0.0)


def test_occupancy_update_marks_hit_voxel():
    """A single ray pointing at a known world point must deposit mass in
    the voxel containing it."""
    geo = dataclasses.replace(GEO, feature_size=1)
    vm = VoxelMap.create(geo, (0.0, 0.0, 0.0))
    rays = jnp.asarray([[[0.0, 0.0, -1.0]]])  # looks along eye dir
    depth = jnp.asarray([[[0.5]]])
    feats = jnp.ones((1, 1, 1))
    # yaw=0, elev=0 -> eye = +x; endpoint at (0.5, 0, 0)
    vm = vm.update(rays, jnp.zeros(3), 0.0, 0.0, depth, feats)
    data = np.asarray(vm.grid())
    iy, ix, iz = np.unravel_index(np.argmax(data[..., 0]), data.shape[:3])
    expect = np.asarray(vm.world_to_map(jnp.asarray([0.5, 0.0, 0.0])))
    assert (ix, iy, iz) == (expect[0], expect[1], expect[2])


def test_scan_over_frames_matches_python_loop():
    rng = np.random.RandomState(5)
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))
    frames = [_make_frame(rng, special_depths=False) for _ in range(4)]
    depths = jnp.asarray(np.stack([f[0] for f in frames]))
    feats = jnp.asarray(np.stack([f[1] for f in frames]))
    poss = jnp.asarray(np.stack([f[2]["position"] for f in frames]))
    yaws = jnp.asarray(np.stack([f[2]["yaw"] for f in frames]))
    elevs = jnp.asarray(np.stack([f[2]["elevation"] for f in frames]))

    vm_loop = VoxelMap.create(GEO, ORIGIN)
    for d, ft, pose in frames:
        vm_loop = vm_loop.update(rays, jnp.asarray(pose["position"]),
                                 pose["yaw"], pose["elevation"],
                                 jnp.asarray(d), jnp.asarray(ft))

    def step(vm, frame):
        p, y, e, d, ft = frame
        return vm.update(rays, p, y, e, d, ft), None

    vm_scan, _ = jax.lax.scan(step, VoxelMap.create(GEO, ORIGIN),
                              (poss, yaws, elevs, depths, feats))
    np.testing.assert_allclose(np.asarray(vm_scan.grid()),
                               np.asarray(vm_loop.grid()), atol=1e-5)


def test_top_down_matches_oracle():
    rng = np.random.RandomState(6)
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    fmap, bx, by, bz = _ref_state()
    vm = VoxelMap.create(GEO, ORIGIN)
    for _ in range(3):
        depth, feats, pose = _make_frame(rng, special_depths=False)
        _ref_apply(fmap, bx, by, bz, rays, depth, feats, pose)
        vm = vm.update(jnp.asarray(rays), jnp.asarray(pose["position"]),
                       pose["yaw"], pose["elevation"],
                       jnp.asarray(depth), jnp.asarray(feats))
    ref_td = R.ref_top_down(fmap, 0, 6)
    np.testing.assert_allclose(np.asarray(vm.top_down(0, 6)), ref_td,
                               atol=3e-4)


def test_world_map_round_trip():
    vm = VoxelMap.create(GEO, ORIGIN)
    rng = np.random.RandomState(7)
    cells = np.stack([rng.randint(0, GEO.map_width, 50),
                      rng.randint(0, GEO.map_height, 50),
                      rng.randint(0, GEO.map_depth, 50)],
                     axis=-1).astype(np.float32)
    world = vm.map_to_world(jnp.asarray(cells))
    back = np.asarray(vm.world_to_map(world))
    np.testing.assert_array_equal(back, cells.astype(np.int32))


def test_world_to_map_matches_oracle():
    vm = VoxelMap.create(GEO, ORIGIN)
    _, bx, by, bz = _ref_state()
    rng = np.random.RandomState(8)
    lower = [bx[0] + 0.06, by[0] + 0.06, bz[0] + 0.06]
    upper = [bx[-1] - 0.06, by[-1] - 0.06, bz[-1] - 0.06]
    pts = rng.uniform(lower, upper, size=(100, 3)).astype(np.float32)
    out = np.asarray(vm.world_to_map(jnp.asarray(pts)))
    ref = R.ref_world_to_map(pts, bx, by, bz)
    np.testing.assert_array_equal(out, ref)


def test_map_to_world_matches_oracle():
    vm = VoxelMap.create(GEO, ORIGIN)
    _, bx, by, bz = _ref_state()
    rng = np.random.RandomState(9)
    cells = rng.uniform([0, 0, 0],
                        [GEO.map_width - 1, GEO.map_height - 1,
                         GEO.map_depth - 1], size=(100, 3)).astype(
                             np.float32)
    out = np.asarray(vm.map_to_world(jnp.asarray(cells)))
    ref = R.ref_map_to_world(cells, bx, by, bz)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_host_map_to_world_matches_jnp_path():
    """The controller's numpy fast path (no per-shape XLA compiles)
    must agree bit-for-bit with VoxelMap.map_to_world, including the
    clamp, the flipped-y midpoints, and 2-d inputs; the cache must
    refresh when the map is reset onto new bins."""
    from mass_tpu.core.voxelmap import HostMapToWorld

    vm = VoxelMap.create(GEO, ORIGIN)
    host = HostMapToWorld()
    rng = np.random.RandomState(10)
    cells = rng.uniform([-3, -3, -3],
                        [GEO.map_width + 2, GEO.map_height + 2,
                         GEO.map_depth + 2], size=(64, 3)).astype(
                             np.float32)
    np.testing.assert_array_equal(
        host(vm, cells), np.asarray(vm.map_to_world(cells)))
    np.testing.assert_array_equal(
        host(vm, cells[:, :2]),
        np.asarray(vm.map_to_world(cells[:, :2])))

    vm2 = vm.reset((1.25, -0.75, 0.5))
    np.testing.assert_array_equal(
        host(vm2, cells), np.asarray(vm2.map_to_world(cells)))


def test_host_map_to_world_epoch_cache(monkeypatch):
    """With a caller-declared ``epoch``, the midpoint cache must NOT
    re-read bins off the device across jitted map updates (they return
    fresh bins objects every step — identity keying alone refetches per
    step, a tunnel round trip per planning call), and MUST refetch when
    a reset bumps the epoch."""
    import jax as _jax
    from mass_tpu.config import CameraConfig
    from mass_tpu.core.voxelmap import HostMapToWorld
    from mass_tpu.maps.layers import OccupancyMap

    layer = OccupancyMap(CameraConfig(height=8, width=8),
                         config_geometry=GEO, origin=ORIGIN)
    host = HostMapToWorld()
    fetches = {"n": 0}
    real = _jax.device_get

    def counting(x):
        fetches["n"] += 1
        return real(x)

    monkeypatch.setattr("mass_tpu.core.voxelmap.jax.device_get",
                        counting)
    cells = np.asarray([[1.0, 2.0, 3.0], [4.0, 1.0, 0.0]], np.float32)
    first = host(layer.voxel_map, cells, epoch=layer.bins_epoch)
    assert fetches["n"] == 1

    obs = {"position": np.zeros(3, np.float32), "yaw": 0.1,
           "elevation": -0.2,
           "depth": np.full((8, 8, 1), 1.5, np.float32)}
    layer.update_from_observation(obs)
    again = host(layer.voxel_map, cells, epoch=layer.bins_epoch)
    assert fetches["n"] == 1, "update must not invalidate the cache"
    np.testing.assert_array_equal(first, again)

    layer.reset((1.25, -0.75, 0.5))
    moved = host(layer.voxel_map, cells, epoch=layer.bins_epoch)
    assert fetches["n"] == 2, "reset must invalidate the cache"
    np.testing.assert_array_equal(
        moved, np.asarray(layer.voxel_map.map_to_world(cells)))


def test_clamp_to_world():
    vm = VoxelMap.create(GEO, ORIGIN)
    far = jnp.asarray([100.0, -100.0, 100.0])
    out = np.asarray(vm.clamp_to_world(far))
    _, bx, by, bz = _ref_state()
    np.testing.assert_allclose(
        out, [(bx[-1] + bx[-2]) / 2, (by[0] + by[1]) / 2,
              (bz[-1] + bz[-2]) / 2], atol=1e-6)


def test_reset_recenters():
    vm = VoxelMap.create(GEO, ORIGIN)
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))
    depth = jnp.full((CAM["h"], CAM["w"], 1), 0.5)
    feats = jnp.ones((CAM["h"], CAM["w"], GEO.feature_size))
    vm = vm.update(rays, jnp.zeros(3), 0.0, 0.0, depth, feats)
    vm2 = vm.reset(jnp.asarray([1.0, 2.0, 0.0]))
    assert np.all(np.asarray(vm2.grid()) == 0)
    np.testing.assert_allclose(
        np.asarray(vm2.bins_x),
        R.ref_bins(1.0, GEO.map_width, GEO.grid_resolution), atol=1e-6)


def test_vmap_over_batched_episodes():
    """vmap over a batch of independent maps — the episode-DP axis."""
    rng = np.random.RandomState(10)
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))
    vms = jax.vmap(lambda _: VoxelMap.create(GEO, ORIGIN))(jnp.arange(3))
    depth = jnp.asarray(rng.uniform(
        0.05, 1.4, size=(3, CAM["h"], CAM["w"], 1)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(
        0, 1, size=(3, CAM["h"], CAM["w"], GEO.feature_size)).astype(
            np.float32))
    pos = jnp.zeros((3, 3))
    yaw = jnp.asarray([0.0, 1.0, 2.0])
    elev = jnp.zeros(3)

    out = jax.vmap(
        lambda m, p, y, e, d, f: m.update(rays, p, y, e, d, f))(
            vms, pos, yaw, elev, depth, feats)
    single = vms and None  # noqa: F841
    for i, (y,) in enumerate(zip([0.0, 1.0, 2.0])):
        vm_i = VoxelMap.create(GEO, ORIGIN).update(
            rays, pos[i], y, 0.0, depth[i], feats[i])
        np.testing.assert_allclose(np.asarray(out.data[i]),
                                   np.asarray(vm_i.data), atol=1e-5)


def test_update_classes_matches_dense_onehot():
    """The scalar-scatter one-hot fast path must equal the dense path
    fed an explicit one-hot image (and hence the reference semantics)."""
    rng = np.random.RandomState(11)
    geo = dataclasses.replace(GEO, feature_size=5)
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))
    vm_cls = VoxelMap.create(geo, ORIGIN)
    vm_dense = VoxelMap.create(geo, ORIGIN)
    for _ in range(3):
        depth, _, pose = _make_frame(rng, special_depths=False)
        classes = rng.randint(0, 5, (CAM["h"], CAM["w"])).astype(np.int32)
        onehot = np.eye(5, dtype=np.float32)[classes]
        args = (jnp.asarray(pose["position"]), pose["yaw"],
                pose["elevation"], jnp.asarray(depth))
        vm_cls = vm_cls.update_classes(rays, *args, jnp.asarray(classes))
        vm_dense = vm_dense.update(rays, *args, jnp.asarray(onehot))
    np.testing.assert_allclose(np.asarray(vm_cls.grid()),
                               np.asarray(vm_dense.grid()), atol=1e-5)
    assert np.asarray(vm_cls.grid()).any()


def test_occupancy_equals_semantic_channel_sum():
    """An occupancy map updated in lockstep with a semantic map from the
    same frames equals the semantic map's channel sum identically (both
    satisfy x' = x*mult + iw*S2/W from zero init) — the agent exploits
    this to navigate off the semantic map without a separate occupancy
    update."""
    rng = np.random.RandomState(12)
    geo_sem = dataclasses.replace(GEO, feature_size=5)
    geo_occ = dataclasses.replace(GEO, feature_size=1)
    rays = jnp.asarray(
        R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"]))
    sem = VoxelMap.create(geo_sem, ORIGIN)
    occ = VoxelMap.create(geo_occ, ORIGIN)
    for _ in range(3):
        depth, _, pose = _make_frame(rng, special_depths=False)
        classes = rng.randint(0, 5, (CAM["h"], CAM["w"])).astype(
            np.int32)
        args = (jnp.asarray(pose["position"]), pose["yaw"],
                pose["elevation"], jnp.asarray(depth))
        sem = sem.update_classes(rays, *args, jnp.asarray(classes))
        occ = occ.update_classes(
            rays, *args, jnp.zeros((CAM["h"], CAM["w"]), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(occ.grid())[..., 0],
        np.asarray(sem.grid()).sum(-1), atol=1e-5)
    assert np.asarray(occ.grid()).any()
