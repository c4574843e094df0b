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


def test_clip_map_centre_ray_and_query_render():
    """ClipMap semantics (reference: clip_projection_layer.py:124-194):
    the whole-image embedding lands at the image-centre ray's voxel
    only, and the query heat-map (reference: :227-281) separates two
    embeddings spatially."""
    from mass_tpu.maps import ClipMap
    from mass_tpu.utils.visualization import render_feature_query

    F = 128   # vmajor layout wants lane-aligned features

    def encoder(rgb):
        mean = jnp.mean(rgb.reshape(-1, 3), axis=0)
        return jnp.tile(mean, 44)[:F]

    clip = ClipMap(CameraConfig(height=24, width=24), F, encoder,
                   map_height=32, map_width=32, map_depth=8,
                   grid_resolution=0.125)

    def obs(rgb_color, yaw):
        return dict(position=np.zeros(3, np.float32),
                    yaw=np.float32(yaw), elevation=np.float32(0.0),
                    depth=np.full((24, 24, 1), 1.0, np.float32),
                    rgb=np.broadcast_to(
                        np.asarray(rgb_color, np.float32),
                        (24, 24, 3)).copy())

    red, blue = (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)
    clip.update_from_observation(obs(red, 0.0))
    top1 = np.asarray(clip.voxel_map.top_down(0, 8))
    cells1 = set(zip(*np.nonzero(np.any(top1 != 0, axis=-1))))
    # one centre ray -> at most a couple of trilinear-neighbour cells
    assert 1 <= len(cells1) <= 4
    # the stored feature points along the red embedding
    cell = next(iter(cells1))
    v = top1[cell[0], cell[1]]
    q = np.asarray(encoder(jnp.asarray(obs(red, 0.0)["rgb"])))
    cos = v @ q / (np.linalg.norm(v) * np.linalg.norm(q))
    assert cos > 0.999

    clip.update_from_observation(obs(blue, np.pi))
    top2 = np.asarray(clip.voxel_map.top_down(0, 8))
    cells2 = set(zip(*np.nonzero(np.any(top2 != 0, axis=-1))))
    blue_cells = cells2 - cells1
    assert blue_cells and not (blue_cells & cells1)

    heat = render_feature_query(
        clip.voxel_map,
        np.stack([np.asarray(encoder(jnp.asarray(obs(c, 0)["rgb"])))
                  for c in (red, blue)]), 0, 8)
    r_cell = next(iter(cells1))
    b_cell = next(iter(blue_cells))
    assert heat[r_cell[0], r_cell[1], 0] > 0.9   # red query wins here
    assert heat[b_cell[0], b_cell[1], 0] < 0.1   # blue cell rejects it
    # unobserved cells render as white background
    empty = ~np.any(top2 != 0, axis=-1)
    assert np.all(heat[empty] == 1.0)
