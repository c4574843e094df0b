"""Closed-loop integration: maps + nav controller inside the grid world.

This is the simulator-free analogue of the reference's only validation
path (running episodes end-to-end); it exercises observation
processing, voxel-map updates, traversability, BFS planning, and the
local action policy together.
"""

import numpy as np

from mass_tpu.config import CameraConfig, MapGeometry, NavConfig
from mass_tpu.env import rearrange as RR
from mass_tpu.maps import MapSet, OccupancyMap, SemanticMap
from mass_tpu.nav.controller import NavigationController

CAM = CameraConfig(height=48, width=48)
GEO_KW = dict(map_height=80, map_width=80, map_depth=24,
              grid_resolution=0.125)
NAV = NavConfig(step_size=2, obstacle_padding=2, map_slice_start=4,
                map_slice_stop=16, graph_update_interval=5)


def _controller(task):
    loc = task.agent_location()
    origin = (loc.x, loc.z, loc.y)
    maps = MapSet(
        occupancy=OccupancyMap(CAM, **GEO_KW),
        semantic=SemanticMap(CAM, num_classes=54, **GEO_KW))
    maps.reset_all(origin)
    return NavigationController(task, "occupancy", maps, NAV,
                                rng=np.random.RandomState(0))


def test_walkthrough_builds_map_and_navigates():
    sampler = RR.GridWorldTaskSampler([11], camera=CAM, max_steps=120,
                                      num_objects=3, num_misplaced=1,
                                      num_opened=0)
    task = sampler.next_task()
    ctl = _controller(task)
    # look down once like the reference's startup hack (agent.py:310-312)
    task.step(task.action_names().index("look_down"))

    start = ctl.process_position()
    obs = task.get_observations()
    ctl.process_observations(obs, update_map=["occupancy", "semantic"])

    goal = ctl.sample_navigation_goal({})
    steps = 0
    for obs in ctl.navigate_to(goal,
                               update_map=["occupancy", "semantic"]):
        steps += 1
        assert "path" in obs or steps == 0
        if steps > 100:
            break

    occ = ctl.maps["occupancy"].voxel_map
    assert float(np.asarray(occ.data).sum()) > 0
    sem_mask = np.asarray(
        ctl.maps["semantic"].voxel_map.occupancy_mask(0, 24))
    assert sem_mask.any()
    end = ctl.process_position()
    # the agent either reached the goal's vicinity or at least moved
    moved = np.linalg.norm(end[:2] - start[:2])
    near = np.linalg.norm(end[:2] - np.asarray(goal)[:2])
    assert moved > 0.2 or near < 0.6, (moved, near)


def test_frontier_goal_prefers_unexplored_direction():
    sampler = RR.GridWorldTaskSampler([15], camera=CAM, max_steps=60,
                                      num_objects=3, num_misplaced=1,
                                      num_opened=0)
    task = sampler.next_task()
    ctl = _controller(task)
    task.step(task.action_names().index("look_down"))
    obs = task.get_observations()
    ctl.process_observations(obs, update_map="occupancy")
    ctl.update_navigation_grid()

    pos = ctl.process_position()
    nodes, hops = ctl.navigable_node_cells(pos, with_dist=True)
    goal = ctl.frontier_navigation_goal({})
    assert np.asarray(goal).shape == (3,)
    # the chosen goal is one of the reachable nodes
    cell = np.asarray(ctl.maps["occupancy"].voxel_map.world_to_map(
        np.asarray(goal, np.float32)[:2]))
    hit = np.nonzero((nodes == cell).all(-1))[0]
    assert hit.size > 0
    # after one frame only the viewing cone is observed, so frontier
    # mass must exist; farthest-frontier rule: the pick carries
    # positive mass AND the max hop count among positive-mass nodes
    from mass_tpu.nav import grid as NG
    mass = np.asarray(NG.frontier_mass(
        ctl.maps["occupancy"].voxel_map, 8,
        padding=0, z_start=NAV.map_slice_start,
        z_stop=NAV.map_slice_stop))
    scores = mass[nodes[:, 1], nodes[:, 0]]
    assert scores.max() > 0
    assert scores[hit[0]] > 0
    assert hops[hit[0]] == hops[scores > 0].max()


def test_failed_action_prunes_node():
    sampler = RR.GridWorldTaskSampler([13], camera=CAM, max_steps=60,
                                      num_objects=3, num_misplaced=1,
                                      num_opened=0)
    task = sampler.next_task()
    ctl = _controller(task)
    obs = task.get_observations()
    ctl.process_observations(obs, update_map="occupancy")
    ctl.update_navigation_grid()
    alive_before = int(np.asarray(ctl.nav_grid.alive).sum())
    # fabricate a failed move along a straight path
    obs["path"] = np.asarray([[0.0, 0.0, 0.0],
                              ctl.maps["occupancy"].map_to_world(
                                  np.asarray([48.0, 48.0, 0.0]))],
                             dtype=object)[1][None].repeat(2, 0)
    ctl.failed_action(obs, task.action_names().index("move_ahead"))
    alive_after = int(np.asarray(ctl.nav_grid.alive).sum())
    assert alive_after <= alive_before
