"""Pallas splat kernel parity (interpret mode on CPU) vs the XLA path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.ops import pallas_splat as PS
from mass_tpu.ops.scatter import (apply_onehot_cmajor,
                                  corner_contributions, segment_totals)
from tests import reference_impl as R

# smallest geometry whose V is a SPAN multiple: 32*16*4 = 2048.
# Layout pinned: these tests exercise the TPU kernel (interpret mode on
# the CPU suite), and "auto" resolves to vmajor on host backends.
GEO = MapGeometry(map_height=32, map_width=16, map_depth=4,
                  feature_size=6, grid_resolution=0.2, layout="cmajor")
CAM = dict(h=9, w=11, f=7.0)


def test_segment_totals():
    vals = jnp.asarray([1., 2., 3., 4., 5., 6.])
    heads = jnp.asarray([True, False, True, False, False, True])
    out = np.asarray(segment_totals(vals, heads))
    np.testing.assert_allclose(out, [3, 3, 12, 12, 12, 6])


def test_segment_totals_multichannel():
    vals = jnp.asarray([[1., 10.], [2., 20.], [3., 30.]])
    heads = jnp.asarray([True, True, False])
    out = np.asarray(segment_totals(vals, heads))
    np.testing.assert_allclose(out, [[1, 10], [5, 50], [5, 50]])


def _random_points(rng, vm):
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    depth = rng.uniform(0.05, 2.2,
                        (CAM["h"], CAM["w"], 1)).astype(np.float32)
    depth[0, 0, 0] = 50.0  # some invalid pixels
    yaw = np.float32(rng.uniform(-np.pi, np.pi))
    elev = np.float32(rng.uniform(-0.8, 0.2))
    pos = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    oriented = G.orient_rays(jnp.asarray(rays), yaw, elev)
    pts = G.bin_rays(vm.bins_x, vm.bins_y, vm.bins_z,
                     jnp.asarray(pos), oriented, jnp.asarray(depth))
    g = vm.geometry
    return corner_contributions(
        pts, (g.map_height, g.map_width, g.map_depth))


def test_kernel_matches_xla_path():
    rng = np.random.RandomState(0)
    vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    data = jnp.asarray(rng.rand(GEO.feature_size,
                                GEO.num_voxels).astype(np.float32))
    classes = jnp.asarray(rng.randint(
        0, GEO.feature_size, (CAM["h"] * CAM["w"],)).astype(np.int32))
    ids, w = _random_points(rng, vm)

    ref = apply_onehot_cmajor(data, ids, w, classes, 0.5)
    out = PS.splat_onehot_cmajor(data, ids, w, classes, 0.5,
                                 interpret=True)
    assert np.asarray(jnp.abs(ref - data)).max() > 0  # update happened
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_kernel_sequential_updates_match_oracle():
    """Two kernel updates in sequence match the NumPy oracle of the
    reference semantics end-to-end."""
    rng = np.random.RandomState(1)
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    fmap = np.zeros((GEO.map_height, GEO.map_width, GEO.map_depth,
                     GEO.feature_size), np.float32)
    bx = R.ref_bins(0.0, GEO.map_width, GEO.grid_resolution)
    by = R.ref_bins(0.0, GEO.map_height, GEO.grid_resolution)
    bz = R.ref_bins(0.0, GEO.map_depth, GEO.grid_resolution)

    vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    jrays = jnp.asarray(rays)
    for _ in range(2):
        depth = rng.uniform(0.05, 2.2,
                            (CAM["h"], CAM["w"], 1)).astype(np.float32)
        classes = rng.randint(0, GEO.feature_size,
                              (CAM["h"], CAM["w"])).astype(np.int32)
        onehot = np.eye(GEO.feature_size,
                        dtype=np.float32)[classes]
        pos = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        yaw = np.float32(rng.uniform(-np.pi, np.pi))
        elev = np.float32(rng.uniform(-0.6, 0.2))
        R.ref_full_update(fmap, bx, by, bz, rays, pos, yaw, elev,
                          depth, onehot, interpolation_weight=0.5)
        vm = vm.update_classes(jrays, jnp.asarray(pos), yaw, elev,
                               jnp.asarray(depth), jnp.asarray(classes),
                               use_kernel=True)

    np.testing.assert_allclose(np.asarray(vm.grid()), fmap, atol=1e-4)


def test_multi_kernel_matches_per_map_kernels():
    """One multi-map launch == independent per-map splats (occupancy +
    semantic sharing the frame's binning, distinct EMA weights)."""
    rng = np.random.RandomState(3)
    vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    ids, w = _random_points(rng, vm)
    n = CAM["h"] * CAM["w"]
    data_occ = jnp.asarray(rng.rand(1, GEO.num_voxels).astype(
        np.float32))
    data_sem = jnp.asarray(rng.rand(GEO.feature_size,
                                    GEO.num_voxels).astype(np.float32))
    cls_occ = jnp.zeros((n,), jnp.int32)
    cls_sem = jnp.asarray(rng.randint(0, GEO.feature_size,
                                      (n,)).astype(np.int32))

    out_occ, out_sem = PS.splat_onehot_multi_cmajor(
        (data_occ, data_sem), ids, w, (cls_occ, cls_sem), (0.5, 0.25),
        interpret=True)
    ref_occ = apply_onehot_cmajor(data_occ, ids, w, cls_occ, 0.5)
    ref_sem = apply_onehot_cmajor(data_sem, ids, w, cls_sem, 0.25)
    assert np.asarray(jnp.abs(ref_sem - data_sem)).max() > 0
    np.testing.assert_allclose(np.asarray(out_occ), np.asarray(ref_occ),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sem), np.asarray(ref_sem),
                               atol=1e-5)


def test_apply_onehot_group_kernel_path():
    """VoxelMap-level group apply (kernel, interpret mode) matches the
    XLA per-map fallback."""
    from mass_tpu.core.voxelmap import apply_onehot_group
    rng = np.random.RandomState(4)
    vm_sem = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    vm_occ = VoxelMap.create(
        dataclasses.replace(GEO, feature_size=1), (0.0, 0.0, 0.0))
    ids, w = _random_points(rng, vm_sem)
    n = CAM["h"] * CAM["w"]
    cls_occ = jnp.zeros((n,), jnp.int32)
    cls_sem = jnp.asarray(rng.randint(0, GEO.feature_size,
                                      (n,)).astype(np.int32))

    fused = apply_onehot_group([vm_occ, vm_sem], ids, w,
                               [cls_occ, cls_sem], use_kernel=True)
    ref = apply_onehot_group([vm_occ, vm_sem], ids, w,
                             [cls_occ, cls_sem], use_kernel=False)
    for got, want in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(got.data),
                                   np.asarray(want.data), atol=1e-5)
    assert float(np.abs(np.asarray(fused[1].data)).sum()) > 0


def test_frames_kernel_matches_sequential_updates():
    """One T-frame launch == T sequential per-frame updates (the blend
    order within every voxel must be preserved across frames)."""
    rng = np.random.RandomState(5)
    rays = R.ref_camera_rays(CAM["h"], CAM["w"], CAM["f"], CAM["f"])
    jrays = jnp.asarray(rays)
    T = 3
    positions = jnp.asarray(
        rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32))
    yaws = jnp.asarray(rng.uniform(-np.pi, np.pi, T).astype(np.float32))
    elevs = jnp.asarray(rng.uniform(-0.6, 0.2, T).astype(np.float32))
    depths = jnp.asarray(rng.uniform(
        0.05, 2.2, (T, CAM["h"], CAM["w"], 1)).astype(np.float32))
    classes = jnp.asarray(rng.randint(
        0, GEO.feature_size, (T, CAM["h"], CAM["w"])).astype(np.int32))

    vm_seq = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    for t in range(T):
        vm_seq = vm_seq.update_classes(
            jrays, positions[t], yaws[t], elevs[t], depths[t],
            classes[t], use_kernel=False)

    vm_batched = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    vm_batched = vm_batched.update_classes_frames(
        jrays, positions, yaws, elevs, depths, classes,
        use_kernel=True)

    a = np.asarray(vm_batched.data)
    b = np.asarray(vm_seq.data)
    assert np.abs(b).max() > 0
    np.testing.assert_allclose(a, b, atol=1e-5)

    # the XLA fallback scan path agrees too
    vm_scan = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    vm_scan = vm_scan.update_classes_frames(
        jrays, positions, yaws, elevs, depths, classes,
        use_kernel=False)
    np.testing.assert_allclose(np.asarray(vm_scan.data), b, atol=1e-5)


def test_fast_bf16_mode_close_but_not_exact():
    """The opt-in bf16 matmul path tracks the f32 kernel to ~bf16
    rounding (and actually differs — proving the fast path engaged)."""
    rng = np.random.RandomState(6)
    vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    data = jnp.asarray(rng.rand(GEO.feature_size,
                                GEO.num_voxels).astype(np.float32))
    classes = jnp.asarray(rng.randint(
        0, GEO.feature_size, (CAM["h"] * CAM["w"],)).astype(np.int32))
    ids, w = _random_points(rng, vm)

    exact = PS.splat_onehot_cmajor(data, ids, w, classes, 0.5,
                                   interpret=True)
    fast = PS.splat_onehot_cmajor(data, ids, w, classes, 0.5,
                                  interpret=True, fast_bf16=True)
    d = np.abs(np.asarray(fast) - np.asarray(exact))
    scale = np.abs(np.asarray(exact)).max()
    assert d.max() > 0                      # the fast path is distinct
    assert d.max() / scale < 2e-2, d.max() / scale


def test_precision_highest_matches_xla_path():
    """precision="highest" must produce the exact-parity result (in
    interpret mode both precisions are host f32; this pins the arg
    plumbing through all three wrappers — the on-chip numbers live in
    docs/performance.md "MXU precision on chip")."""
    rng = np.random.RandomState(7)
    vm = VoxelMap.create(GEO, (0.0, 0.0, 0.0))
    data = jnp.asarray(rng.rand(GEO.feature_size,
                                GEO.num_voxels).astype(np.float32))
    classes = jnp.asarray(rng.randint(
        0, GEO.feature_size, (CAM["h"] * CAM["w"],)).astype(np.int32))
    ids, w = _random_points(rng, vm)
    ref = apply_onehot_cmajor(data, ids, w, classes, 0.5)

    out = PS.splat_onehot_cmajor(data, ids, w, classes, 0.5,
                                 interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    frames = PS.splat_onehot_frames_cmajor(
        data, ids[None], w[None], classes[None], 0.5,
        interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(frames), np.asarray(ref),
                               atol=1e-5)
    multi = PS.splat_onehot_multi_cmajor(
        (data,), ids, w, (classes,), (0.5,),
        interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(multi[0]), np.asarray(ref),
                               atol=1e-5)


def test_precision_threads_from_agent_config():
    """AgentConfig.map_precision reaches the kernels via MapGeometry
    (the CLI exposes it as --map-precision)."""
    from mass_tpu.config import AgentConfig
    cfg = AgentConfig(map_precision="highest")
    assert cfg.geometry(54).precision == "highest"
    assert AgentConfig().geometry(54).precision == "default"
    assert PS._dot_precision("highest") is not None
    assert PS._dot_precision("default") is None


def test_kernel_occupancy_single_channel():
    geo = dataclasses.replace(GEO, feature_size=1)
    rng = np.random.RandomState(2)
    vm = VoxelMap.create(geo, (0.0, 0.0, 0.0))
    ids, w = _random_points(rng, vm)
    classes = jnp.zeros((CAM["h"] * CAM["w"],), jnp.int32)
    data = jnp.zeros((1, geo.num_voxels))
    ref = apply_onehot_cmajor(data, ids, w, classes, 0.5)
    out = PS.splat_onehot_cmajor(data, ids, w, classes, 0.5,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
