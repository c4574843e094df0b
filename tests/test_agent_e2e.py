"""End-to-end agent episodes in the procedural grid world.

The full vertical slice: mapping -> exploration -> map differencing ->
navigation -> manipulation -> metrics, with no simulator dependency.
"""

import dataclasses

import numpy as np
import pytest

from mass_tpu.config import AgentConfig, CameraConfig, MatchConfig, \
    NavConfig
from mass_tpu.agent.loop import RearrangementAgent
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
        exploration_budget_one=3, exploration_budget_two=3,
        logdir=str(tmp_path) if tmp_path else None,
        start_task=0, total_tasks=1, every_tasks=1)
    base.update(kw)
    return AgentConfig(**base)


@pytest.mark.slow
def test_agent_episode_with_gt_search(tmp_path):
    cfg = _config(tmp_path, ground_truth_semantic_search=True,
                  ground_truth_disagreement=True)
    sampler = GridWorldTaskSampler([21], camera=CAM, max_steps=200,
                                   num_objects=3, num_misplaced=1,
                                   num_opened=0)

    frames = []

    class _CaptureWriter:
        def write(self, frame):
            frames.append(frame)

        def close(self):
            frames.append("closed")

    agent = RearrangementAgent(cfg, sampler,
                               rng=np.random.RandomState(0),
                               video_writer_factory=lambda
                               task_id: _CaptureWriter())
    results = agent.run()
    assert len(results) == 1
    # episode video frames: the 4-panel composite (rgb | occupancy+path
    # | semantic0 | semantic1 — reference: agent.py:51-104) was written
    # per step and the writer closed
    assert frames and frames[-1] == "closed"
    panels = [f for f in frames if not isinstance(f, str)]
    assert len(panels) > 10
    f0 = panels[0]
    assert f0.dtype == np.uint8 and f0.ndim == 3 and f0.shape[2] == 3
    assert f0.shape[1] > f0.shape[0]    # panels concatenate horizontally
    assert any(p.max() > 0 for p in panels)
    m = results[0]
    assert m["unshuffle/num_initially_misplaced"] >= 1
    # per-stage timing observability (SURVEY.md §5.1)
    assert {"simulator", "mapping", "planning"} <= set(m["timing"])
    assert m["timing"]["mapping"]["count"] > 0
    # outputs written
    assert (tmp_path / "results" / "0.json").exists()
    assert (tmp_path / "results" / "analytics-0.csv").exists()
    # the maps were actually built
    assert float(np.asarray(
        agent.maps["semantic0"].voxel_map.data).sum()) > 0
    assert float(np.asarray(
        agent.maps["semantic1"].voxel_map.data).sum()) > 0


@pytest.mark.slow
def test_agent_fixes_object_in_easy_episode(tmp_path):
    """With generous budgets and GT hints, the agent should fix at least
    one misplaced object in a simple scene."""
    cfg = _config(tmp_path, ground_truth_semantic_search=True,
                  ground_truth_disagreement=True,
                  exploration_budget_one=4, exploration_budget_two=4)
    best = 0.0
    for seed in (2, 4):
        sampler = GridWorldTaskSampler([seed], camera=CAM,
                                       max_steps=250, num_objects=2,
                                       num_misplaced=1, num_opened=0)
        agent = RearrangementAgent(
            dataclasses.replace(cfg, start_task=0, total_tasks=1),
            sampler, rng=np.random.RandomState(1))
        m = agent.run()[0]
        best = max(best, m["unshuffle/prop_fixed"])
    assert best > 0.0


def test_resume_skips_completed_tasks(tmp_path):
    """--resume scans logdir and skips tasks whose results JSON exists,
    while keeping the sampler's seed cursor aligned with a fresh run
    (SURVEY.md §5.3: logdir-scan task resumability; the reference only
    resumes within one process, agent.py:657-662)."""
    import json
    import os

    cfg = _config(tmp_path, start_task=0, total_tasks=3, resume=True)
    sampler = GridWorldTaskSampler(list(range(4)), camera=CAM,
                                   max_steps=60, num_objects=2,
                                   num_misplaced=1, num_opened=0)
    agent = RearrangementAgent(cfg, sampler,
                               rng=np.random.RandomState(0))

    # tasks 0 and 2 are "already done" from a previous process
    os.makedirs(tmp_path / "results", exist_ok=True)
    for done in (0, 2):
        with open(tmp_path / "results" / f"{done}.json", "w") as f:
            json.dump({"unshuffle/prop_fixed_strict": 1.0}, f)

    ran = []

    def fake_run_task(task_id):
        # consume the episode exactly like the real run_task does
        agent.sampler.next_task()
        agent.sampler.next_task()
        ran.append((task_id, agent.sampler.current_episode.task_id))
        return {"task": task_id}

    agent.run_task = fake_run_task
    results = agent.run()

    # only the missing task ran, and its sampler episode seed matches
    # what an uninterrupted run would have given task 1
    assert ran == [(1, 1)]
    assert results == [{"task": 1}]
    # the config cursor still advanced past every task
    assert cfg.start_task == 3 and cfg.total_tasks == 0
