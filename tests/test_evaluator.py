"""Lockstep fleet evaluation: B full episodes through shared batched
mapping/planning must reproduce the sequential agent's behavior on the
same seeds (parallel/evaluator.py)."""

import numpy as np
import pytest

from mass_tpu.config import AgentConfig, CameraConfig, MatchConfig, \
    NavConfig
from mass_tpu.env.rearrange import GridWorldTaskSampler
from mass_tpu.parallel.evaluator import FleetEvaluator

CAM = CameraConfig(height=48, width=48)
SEEDS = [2, 4]


def _config(tmp_path):
    return AgentConfig(
        camera=CAM, map_height=80, map_width=80, map_depth=24,
        grid_resolution=0.125,
        nav=NavConfig(step_size=2, obstacle_padding=2,
                      map_slice_start=0, map_slice_stop=12,
                      graph_update_interval=5, max_goal_steps=60),
        match=MatchConfig(contour_padding=0, confidence_threshold=0.1,
                          distance_threshold=0.2, max_instances=8),
        exploration_budget_one=3, exploration_budget_two=2,
        ground_truth_semantic_search=True,
        ground_truth_disagreement=True,
        logdir=str(tmp_path), start_task=0, total_tasks=1,
        every_tasks=1)


def _sampler(seed):
    return GridWorldTaskSampler([seed], camera=CAM, max_steps=250,
                                num_objects=2, num_misplaced=1,
                                num_opened=0)


@pytest.mark.slow
def test_fleet_evaluator_matches_sequential_agent(tmp_path):
    cfg = _config(tmp_path)
    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS])
    fleet_results = fleet.run()
    assert all(r is not None for r in fleet_results)

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, _sampler(s), rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "unshuffle/num_initially_misplaced")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s

    # the fleet actually fixes objects on these seeds
    assert np.mean([r["unshuffle/prop_fixed"]
                    for r in fleet_results]) > 0


@pytest.mark.slow
def test_fleet_walkthrough_exhaustion_enters_unshuffle(tmp_path):
    """A walkthrough task that hits max_steps must NOT end the episode:
    the fleet proceeds to the unshuffle phase exactly like the
    sequential agent (advisor r2: the WALK-phase is_done used to call
    _finish(), scoring the untouched scene).  max_steps=40 < budget 3 x
    max_goal_steps 60 guarantees walkthrough exhaustion."""
    cfg = _config(tmp_path)

    def sampler(seed):
        return GridWorldTaskSampler([seed], camera=CAM, max_steps=40,
                                    num_objects=2, num_misplaced=1,
                                    num_opened=0)

    fleet = FleetEvaluator(cfg, [sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS])
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, sampler(s), rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "unshuffle/num_initially_misplaced")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s
    # the unshuffle phase actually ran: the matcher moved something
    # on at least one seed (previously the episode ended at WALK with
    # objects_moved == [] everywhere)
    assert any(r["unshuffle/objects_moved"] for r in fleet_results)


@pytest.mark.slow
def test_fleet_evaluator_mixed_completion(tmp_path):
    """Episodes of different lengths: the fleet keeps ticking after the
    shortest finishes, and every result materializes."""
    import dataclasses
    cfg = dataclasses.replace(_config(tmp_path),
                              exploration_budget_one=1,
                              exploration_budget_two=1)
    evaluator = FleetEvaluator(
        cfg, [_sampler(2), _sampler(7), _sampler(11)],
        seeds=[1, 2, 3])
    results = evaluator.run()
    assert len(results) == 3
    for r in results:
        assert r is not None
        assert "unshuffle/prop_fixed" in r
        assert "unshuffle/objects_to_move" in r


@pytest.mark.slow
def test_fleet_policy_goals_match_sequential_agent(tmp_path):
    """Semantic-search goals in the fleet (sampled per episode from the
    shared slab maps) must reproduce the sequential agent's episodes on
    matched seeds — same policy params, same per-episode key streams."""
    import dataclasses
    import jax
    from mass_tpu.search import policy as pol

    cfg = dataclasses.replace(
        _config(tmp_path), ground_truth_semantic_search=False,
        semantic_search_walkthrough=True,
        semantic_search_unshuffle=True)
    params = pol.init_params(jax.random.PRNGKey(3), cfg.map_height,
                             cfg.map_width, 54)

    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS],
                           policy_params=params)
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, _sampler(s), policy_params=params,
            rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s


@pytest.mark.slow
def test_fleet_frontier_goals_match_sequential_agent(tmp_path):
    """Frontier-exploration goals (argmax of the jitted frontier-mass
    field over reachable nodes, nav/grid.frontier_mass) must reproduce
    the sequential agent's episodes on matched seeds — both drivers
    draw the goal through the same controller rng stream."""
    import dataclasses

    cfg = dataclasses.replace(
        _config(tmp_path), ground_truth_semantic_search=False,
        frontier_exploration=True)

    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS])
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, _sampler(s), rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "walkthrough/observed_cells", "unshuffle/observed_cells")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s


@pytest.mark.slow
def test_fleet_revisit_goals_match_sequential_agent(tmp_path):
    """Walkthrough-site revisit goals (match/revisit.py: unshuffle
    exploration targets the walkthrough map's own find() sites) must
    reproduce the sequential agent's episodes on matched seeds — the
    site lists derive from bit-identical maps and the picks ride the
    same controller rng stream."""
    import dataclasses

    cfg = dataclasses.replace(
        _config(tmp_path), ground_truth_semantic_search=False,
        revisit_exploration=True, frontier_exploration=True)

    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS])
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, _sampler(s), rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "walkthrough/observed_cells", "unshuffle/observed_cells")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s


@pytest.mark.slow
def test_fleet_one_phase_matches_sequential_agent(tmp_path):
    """One-phase fleet episodes (single task, goal-fed semantic0 via a
    second batched launch per tick) must reproduce the sequential
    one-phase driver on matched seeds.  Two misplaced classes make the
    matcher run again AFTER rearrangement navigation, pinning that the
    fleet freezes the same maps during REARRANGE as the sequential
    driver (update_map=phase_two only, agent/loop.py _rearrange)."""
    import dataclasses
    cfg = dataclasses.replace(_config(tmp_path), one_phase=True,
                              exploration_budget_one=2,
                              exploration_budget_two=1)

    def sampler(seed):
        return GridWorldTaskSampler([seed], camera=CAM, max_steps=250,
                                    one_phase=True, num_objects=3,
                                    num_misplaced=2, num_opened=0)

    fleet = FleetEvaluator(cfg, [sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS])
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, sampler(s), rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "unshuffle/num_initially_misplaced")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s
    # the one-phase fleet actually fixes objects on these seeds
    assert np.mean([r["unshuffle/prop_fixed"]
                    for r in fleet_results]) > 0


@pytest.mark.slow
def test_fleet_conditioned_inhibited_policy_matches_sequential(
        tmp_path):
    """The headline learned-head configuration — walkthrough-
    CONDITIONED checkpoint (108-channel input, auto-detected) with
    --policy-inhibition-radius decoding — must reproduce the
    sequential agent's episodes on matched seeds through the fleet
    (previously asserted out of the fleet path)."""
    import dataclasses
    import jax
    from mass_tpu.search import policy as pol

    cfg = dataclasses.replace(
        _config(tmp_path), ground_truth_semantic_search=False,
        semantic_search_walkthrough=True,
        semantic_search_unshuffle=True,
        policy_inhibition_radius=4.0)
    params = pol.init_params(jax.random.PRNGKey(3), cfg.map_height,
                             cfg.map_width, 2 * 54)
    assert pol.input_channels(params) == 108

    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS],
                           policy_params=params)
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, _sampler(s), policy_params=params,
            rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s


@pytest.mark.slow
def test_fleet_records_found_objects(tmp_path):
    """--record-found-objects through the fleet driver: per-task
    distance matrices + class-name sidecars land in the logdir with
    one row per misplaced object, and the distances are consistent
    with the misplaced-object positions (the agent never teleports, so
    per-step distance deltas are bounded by the move magnitude)."""
    import dataclasses
    import json as _json
    from mass_tpu.agent.cli import main as cli_main

    logdir = str(tmp_path / "fleet-found")
    cli_main(["--backend", "gridworld", "--platform", "cpu",
              "--logdir", logdir, "--total-tasks", "2",
              "--fleet-size", "2", "--num-objects", "2",
              "--num-misplaced", "1", "--num-opened", "0",
              "--map-height", "80", "--map-width", "80",
              "--map-depth", "24", "--grid-resolution", "0.125",
              "--camera-size", "48", "--step-size", "2",
              "--obstacle-padding", "2", "--map-slice-start", "0",
              "--map-slice-stop", "12",
              "--ground-truth-segmentation",
              "--ground-truth-disagreement",
              "--exploration-budget-one", "1",
              "--exploration-budget-two", "1",
              "--max-goal-steps", "20", "--start-task", "2",
              "--record-found-objects"])
    import glob as _glob
    import os as _os
    for task in (2, 3):
        for phase in ("walkthrough", "unshuffle"):
            npy = _os.path.join(logdir, "results",
                                f"objects-found-{phase}-{task}.npy")
            assert _os.path.exists(npy), npy
            dist = np.load(npy)
            assert dist.shape[0] == 1 and dist.shape[1] > 1
            assert (dist >= 0).all() and np.isfinite(dist).all()
            # consecutive-step deltas bounded by one move (0.25 m)
            assert np.abs(np.diff(dist, axis=1)).max() < 0.26
            with open(npy[:-len(".npy")] + "-types.json") as f:
                types = _json.load(f)
            assert len(types) == 1 and isinstance(types[0], str)
    # the analyzer consumes the fleet recordings directly
    from mass_tpu.tools import analyze
    stats = analyze.found_objects_stats_by_class(logdir)
    assert "unshuffle" in stats and stats["unshuffle"]


def _stub_detector():
    """Deterministic shape-static SegmentationModel stand-in: 6
    horizontal-band 'instances' gated by frame brightness."""
    import jax.numpy as jnp
    from mass_tpu.perception.segmentation import Detections

    def model(rgb):
        h = rgb.shape[0]
        bands = jnp.arange(h)[:, None] * 6 // h          # [h, 1]
        lit = rgb.mean(-1) > 0.05                        # [h, w]
        masks = jnp.stack([(bands == k) & lit for k in range(6)])
        return Detections(masks.astype(jnp.float32),
                          jnp.arange(1, 7, dtype=jnp.int32),
                          jnp.full((6,), 1.0, jnp.float32))

    return model


def test_batched_sensor_matches_per_frame():
    """make_batched_sensor == the per-frame sensor, for both the
    one-dispatch detector fast path and the generic loop fallback."""
    from mass_tpu.perception.segmentation import (
        DetectorSegmentation, make_batched_sensor)

    rng = np.random.RandomState(0)
    frames = rng.uniform(0, 1, (3, 24, 24, 3)).astype(np.float32)

    sensor = DetectorSegmentation(_stub_detector(), 0.5)
    per_frame = np.stack([sensor({"rgb": f}) for f in frames])
    batched = make_batched_sensor(sensor)(frames)
    np.testing.assert_array_equal(batched, per_frame)
    assert batched.dtype == per_frame.dtype

    def generic(observation):                 # non-Detector sensor
        return (np.asarray(observation["rgb"]).sum(-1, keepdims=True)
                > 1.5).astype(np.int32)

    looped = make_batched_sensor(generic)(frames)
    np.testing.assert_array_equal(
        looped, np.stack([generic({"rgb": f}) for f in frames]))


@pytest.mark.slow
def test_fleet_learned_segmentation_matches_sequential_agent(tmp_path):
    """A learned detector in fleet mode (ONE batched forward per tick,
    evaluator `sensor=`) must reproduce the sequential driver's
    SegmentationTaskWrapper episodes on matched seeds."""
    import dataclasses
    from mass_tpu.perception.segmentation import (
        DetectorSegmentation, SegmentationSampler)

    cfg = dataclasses.replace(_config(tmp_path),
                              exploration_budget_one=1,
                              exploration_budget_two=1,
                              ground_truth_segmentation=False)
    sensor = DetectorSegmentation(_stub_detector(), 0.5)

    fleet = FleetEvaluator(cfg, [_sampler(s) for s in SEEDS],
                           seeds=[100 + s for s in SEEDS],
                           sensor=sensor)
    fleet_results = fleet.run()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in SEEDS:
        agent = RearrangementAgent(
            cfg, SegmentationSampler(_sampler(s), sensor),
            rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "unshuffle/num_newly_misplaced")
    for got, want, s in zip(fleet_results, seq_results, SEEDS):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s


@pytest.mark.slow
def test_fleet_feature_matching_matches_sequential_agent(tmp_path):
    """--use-feature-matching in the fleet (dense ResNet slabs, one
    batched backbone dispatch per tick) reproduces the sequential
    driver task-for-task on duplicate-class-pair scenes — the
    reference's headline configuration (reference: README.md:39),
    VERDICT r3 item 4."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from mass_tpu.perception import resnet as RN

    variables = RN.ResNet50Stage1().init(
        jax.random.PRNGKey(3), jnp.zeros((1, 48, 48, 3)))
    backbone = RN.make_backbone(variables)

    cfg = dc.replace(_config(tmp_path), use_feature_matching=True)
    seeds = [5, 7]

    def sampler(seed):
        return GridWorldTaskSampler(
            [seed], camera=CAM, max_steps=250, num_objects=1,
            num_misplaced=0, num_opened=0, duplicate_class_pairs=1)

    fleet = FleetEvaluator(cfg, [sampler(s) for s in seeds],
                           seeds=[100 + s for s in seeds],
                           feature_backbone=backbone)
    fleet_results = fleet.run()
    assert all(r is not None for r in fleet_results)
    # the dense slabs were actually written
    assert np.asarray(fleet.fleet.buffers["feature0"]).any()
    assert np.asarray(fleet.fleet.buffers["feature1"]).any()

    from mass_tpu.agent.loop import RearrangementAgent
    seq_results = []
    for s in seeds:
        agent = RearrangementAgent(
            cfg, sampler(s), feature_backbone=backbone,
            rng=np.random.RandomState(100 + s))
        seq_results.append(agent.run_task(0))

    keys = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
            "unshuffle/success", "unshuffle/num_fixed",
            "unshuffle/num_newly_misplaced",
            "unshuffle/num_initially_misplaced")
    for got, want, s in zip(fleet_results, seq_results, seeds):
        for k in keys:
            assert got[k] == want[k], (s, k, got[k], want[k])
        assert got["unshuffle/objects_moved"] == \
            want["unshuffle/objects_moved"], s
