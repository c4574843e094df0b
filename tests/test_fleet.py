"""Fleet mapping: B episodes' slab maps in one buffer must be exactly
equivalent to B independent VoxelMaps updated separately (the
episode-parallel serving path, parallel/fleet.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mass_tpu import taxonomy
from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.parallel.fleet import FleetMaps

CAM = CameraConfig(height=12, width=12)
# layout pinned: these tests compare fleet buffers element-for-element
# against single maps of the SAME layout ("auto" would resolve by
# backend — the parametrized test below covers both layouts explicitly)
GEO = MapGeometry(map_height=24, map_width=24, map_depth=8,
                  grid_resolution=0.25, layout="cmajor")
B = 3


def _frames(seed, batch=B):
    rng = np.random.RandomState(seed)
    return dict(
        positions=rng.uniform(-0.4, 0.4, (batch, 3)).astype(np.float32)
        + np.asarray([[2.0, 2.0, 0.8]], np.float32),
        yaws=rng.uniform(-np.pi, np.pi, batch).astype(np.float32),
        elevations=rng.uniform(-0.6, 0.0, batch).astype(np.float32),
        depths=rng.uniform(0.2, 3.0, (batch, 12, 12, 1)).astype(
            np.float32),
        classes={"semantic0": rng.randint(
            0, taxonomy.NUM_CLASSES, (batch, 12, 12)).astype(np.int32)})


def _fleet():
    fleet = FleetMaps(B, CAM, GEO,
                      {"semantic0": taxonomy.NUM_CLASSES,
                       "occupancy": 1})
    for e in range(B):
        fleet.reset(e, (2.0, 2.0, 0.8))
    return fleet


@pytest.mark.parametrize("layout", ["cmajor", "vmajor"])
def test_fleet_matches_independent_maps(layout):
    import dataclasses
    geo = dataclasses.replace(GEO, layout=layout)
    fleet = FleetMaps(B, CAM, geo,
                      {"semantic0": taxonomy.NUM_CLASSES,
                       "occupancy": 1})
    for e in range(B):
        fleet.reset(e, (2.0, 2.0, 0.8))
    assert set(fleet.layouts.values()) == {layout}
    geos = {"semantic0": dataclasses.replace(
                geo, feature_size=taxonomy.NUM_CLASSES),
            "occupancy": dataclasses.replace(geo, feature_size=1)}
    singles = {n: [VoxelMap.create(g, (2.0, 2.0, 0.8))
                   for _ in range(B)] for n, g in geos.items()}

    for step in range(3):
        fr = _frames(step)
        fleet.update_batch(**fr)
        for e in range(B):
            for name in ("semantic0", "occupancy"):
                cls = (fr["classes"]["semantic0"][e] if name ==
                       "semantic0" else np.zeros((12, 12), np.int32))
                singles[name][e] = singles[name][e].update_classes(
                    fleet.rays,
                    jnp.asarray(fr["positions"][e]),
                    jnp.float32(fr["yaws"][e]),
                    jnp.float32(fr["elevations"][e]),
                    jnp.asarray(fr["depths"][e]),
                    jnp.asarray(cls), use_kernel=False)

    for e in range(B):
        for name in ("semantic0", "occupancy"):
            got = np.asarray(fleet.view(name, e).data)
            want = np.asarray(singles[name][e].data)
            assert np.abs(want).sum() > 0
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=f"{name}[{e}]")


def test_fleet_reset_isolates_episodes():
    fleet = _fleet()
    fleet.update_batch(**_frames(7))
    before = [np.asarray(fleet.view("semantic0", e).data)
              for e in range(B)]
    assert all(np.abs(b).sum() > 0 for b in before)

    fleet.reset(1, (5.0, 5.0, 1.0))
    after = [np.asarray(fleet.view("semantic0", e).data)
             for e in range(B)]
    assert np.abs(after[1]).sum() == 0
    np.testing.assert_array_equal(after[0], before[0])
    np.testing.assert_array_equal(after[2], before[2])
    # episode 1's grid recentred, others untouched
    vm1 = fleet.view("semantic0", 1)
    vm0 = fleet.view("semantic0", 0)
    assert not np.allclose(np.asarray(vm1.bins_x),
                           np.asarray(vm0.bins_x))


def test_fleet_active_masks_gate_per_episode_per_family():
    """Mixed-phase fleets: each (episode, family) pair updates only
    when its active bit is set, exactly matching selective per-episode
    updates."""
    import dataclasses
    fleet = _fleet()
    active = {"semantic0": np.asarray([True, False, True]),
              "occupancy": np.asarray([False, True, True])}
    geos = {"semantic0": dataclasses.replace(
                GEO, feature_size=taxonomy.NUM_CLASSES),
            "occupancy": dataclasses.replace(GEO, feature_size=1)}
    singles = {n: [VoxelMap.create(g, (2.0, 2.0, 0.8))
                   for _ in range(B)] for n, g in geos.items()}

    for step in range(2):
        fr = _frames(20 + step)
        fleet.update_batch(**fr, active=active)
        for e in range(B):
            for name in ("semantic0", "occupancy"):
                if not active[name][e]:
                    continue
                cls = (fr["classes"]["semantic0"][e] if name ==
                       "semantic0" else np.zeros((12, 12), np.int32))
                singles[name][e] = singles[name][e].update_classes(
                    fleet.rays, jnp.asarray(fr["positions"][e]),
                    jnp.float32(fr["yaws"][e]),
                    jnp.float32(fr["elevations"][e]),
                    jnp.asarray(fr["depths"][e]),
                    jnp.asarray(cls), use_kernel=False)

    for e in range(B):
        for name in ("semantic0", "occupancy"):
            got = np.asarray(fleet.view(name, e).data)
            want = np.asarray(singles[name][e].data)
            if active[name][e]:
                assert np.abs(want).sum() > 0
            else:
                assert np.abs(got).sum() == 0
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=f"{name}[{e}]")


def test_plan_batch_matches_per_episode_plans():
    """One vmapped dispatch plans every episode exactly as B separate
    plan() calls (nav/grid.plan_batch, the fleet planning path)."""
    import jax
    import jax.numpy as jnp
    from mass_tpu.nav import grid as NG

    fleet = _fleet()
    for s in range(2):
        fleet.update_batch(**_frames(30 + s))

    vms = [fleet.view("occupancy", e) for e in range(B)]
    grids, agents, goals = [], [], []
    rng = np.random.RandomState(0)
    for e, vm in enumerate(vms):
        nav = NG.navigable_area(vm, padding=1, z_start=0, z_stop=6)
        grids.append(NG.build_nav_grid(nav, 0, 0, step=2))
        agents.append(np.asarray([2.0, 2.0, 0.8], np.float32))
        goals.append(rng.uniform(1.0, 3.0, 3).astype(np.float32))

    kw = dict(step=2, padding=1, z_start=0, z_stop=6, threshold=0.0,
              refresh=True)
    singles = [NG.plan(g, vm, jnp.asarray(a), jnp.asarray(gl), **kw)
               for g, vm, a, gl in zip(grids, vms, agents, goals)]

    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[(g, vm, jnp.asarray(a),
                                      jnp.asarray(gl))
                                     for g, vm, a, gl in
                                     zip(grids, vms, agents, goals)])
    batched = NG.plan_batch(*stack, **kw)

    for e in range(B):
        for k, (got, want) in enumerate(zip(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(lambda x: x[e], batched)),
                jax.tree_util.tree_leaves(singles[e]))):
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want),
                                          err_msg=f"ep {e} leaf {k}")


def test_fleet_discard_ids_do_not_leak():
    """An all-invalid frame for episode 0 must not write into episode
    1's slab (discard re-bases to the global slot)."""
    fleet = _fleet()
    fr = _frames(11)
    fr["depths"][0, :, :, 0] = 50.0         # out of range -> discarded
    fleet.update_batch(**fr)
    assert np.abs(np.asarray(fleet.view("semantic0", 0).data)).sum() \
        == 0
    assert np.abs(np.asarray(fleet.view("semantic0", 1).data)).sum() > 0
