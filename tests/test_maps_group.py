"""Fused multi-map group updates: shared binning must be exactly
equivalent to independent per-map updates (the reference re-derives the
ray/bin/scatter geometry per projection layer each step —
mass/nn/base_projection_layer.py:282-343; here one pass feeds every
one-hot map of the same camera and grid)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mass_tpu import taxonomy
from mass_tpu.config import CameraConfig
from mass_tpu.maps import MapSet, OccupancyMap, SemanticMap

CAM = CameraConfig(height=24, width=24)
GEO = dict(map_height=40, map_width=40, map_depth=12,
           grid_resolution=0.2)


def _obs(seed):
    rng = np.random.RandomState(seed)
    return dict(
        position=np.asarray([4.0, 4.0, 1.5], np.float32),
        yaw=np.float32(rng.uniform(-3, 3)),
        elevation=np.float32(-0.4),
        depth=rng.uniform(0.4, 3.0, (24, 24, 1)).astype(np.float32),
        semantic=rng.randint(0, taxonomy.NUM_CLASSES,
                             (24, 24, 1)).astype(np.int32),
        rgb=rng.rand(24, 24, 3).astype(np.float32))


def _fresh():
    maps = MapSet(
        occupancy=OccupancyMap(CAM, **GEO),
        semantic0=SemanticMap(CAM, taxonomy.NUM_CLASSES, **GEO))
    maps.reset_all((4.0, 4.0, 1.5))
    return maps


def test_group_update_matches_individual_updates():
    grouped = _fresh()
    individual = _fresh()
    for seed in range(4):
        obs = _obs(seed)
        grouped.update_group(["occupancy", "semantic0"], obs)
        for name in ("occupancy", "semantic0"):
            individual[name].update_from_observation(obs)
    for name in ("occupancy", "semantic0"):
        a = np.asarray(grouped[name].voxel_map.data)
        b = np.asarray(individual[name].voxel_map.data)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
        assert float(a.sum()) > 0


def test_group_update_shares_binning_once():
    """The jitted group fn computes contributions once per signature."""
    maps = _fresh()
    calls = []
    orig = type(maps["occupancy"].voxel_map).contributions

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    cls = type(maps["occupancy"].voxel_map)
    cls.contributions = spy
    try:
        maps.update_group(["occupancy", "semantic0"], _obs(0))
    finally:
        cls.contributions = orig
    assert len(calls) == 1          # traced once for both maps


def test_one_phase_mapset_goal_remap():
    from mass_tpu.agent.loop import OnePhaseMapSet
    maps = OnePhaseMapSet(
        semantic0=SemanticMap(CAM, taxonomy.NUM_CLASSES, **GEO),
        semantic1=SemanticMap(CAM, taxonomy.NUM_CLASSES, **GEO))
    maps.reset_all((4.0, 4.0, 1.5))
    obs = _obs(1)
    rng = np.random.RandomState(9)
    obs["goal_depth"] = rng.uniform(0.4, 3.0, (24, 24, 1)).astype(
        np.float32)
    obs["goal_semantic"] = rng.randint(
        0, taxonomy.NUM_CLASSES, (24, 24, 1)).astype(np.int32)
    maps.update_group(["semantic0", "semantic1"], obs)

    ref0 = SemanticMap(CAM, taxonomy.NUM_CLASSES, **GEO)
    ref0.reset((4.0, 4.0, 1.5))
    ref0.update_from_observation(
        {**obs, "depth": obs["goal_depth"],
         "semantic": obs["goal_semantic"]})
    ref1 = SemanticMap(CAM, taxonomy.NUM_CLASSES, **GEO)
    ref1.reset((4.0, 4.0, 1.5))
    ref1.update_from_observation(obs)

    np.testing.assert_allclose(
        np.asarray(maps["semantic0"].voxel_map.data),
        np.asarray(ref0.voxel_map.data), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(maps["semantic1"].voxel_map.data),
        np.asarray(ref1.voxel_map.data), atol=1e-6)
    # the two streams differ (different depth/classes)
    assert not np.allclose(np.asarray(maps["semantic0"].voxel_map.data),
                           np.asarray(maps["semantic1"].voxel_map.data))
