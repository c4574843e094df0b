"""Fleet evaluation over the THOR gateway.

The external rearrangement stack is mocked (as in
test_thor_contract.py) but BACKED BY THE GRID WORLD, so full
closed-loop episodes run through ``ThorTask``'s adaptation layer: GT
segmentation arrives as a THOR-style ``semantic_segmentation_frame``
color image, poses as ``env.get_agent_location()`` dicts, steps as
``info["action_success"]`` results.  This pins that

  * ``--fleet-size B`` with ``--backend thor`` drives B persistent
    gateway samplers with correct per-slot task-spec skip-ahead
    (agent/cli.py run_fleet), producing per-task outcomes identical to
    the sequential gateway driver, and
  * the gateway adaptation is lossless: the same episodes through
    ``--backend gridworld`` score identically (color->class round trip,
    pose dict round trip, success passthrough).

Reference: the fleet generalizes the reference's share-nothing
per-process evaluation (agent.py:795-800) to one host serving B Unity
processes from one device pipeline.
"""

import json
import sys
import types

import numpy as np
import pytest

from mass_tpu import taxonomy
from mass_tpu.config import CameraConfig
from mass_tpu.env.rearrange import GridWorldTaskSampler

# scene content the grid-backed fake uses for every task spec (the CLI's
# grid-world scene flags don't reach the THOR backend, by design)
SCENE_KW = dict(num_objects=2, num_misplaced=1, num_opened=0)


class _ExtEnv:
    """THOR's external env surface over one grid-world episode phase."""

    def __init__(self, phase):
        self._phase = phase

    @property
    def poses(self):
        return self._phase.env.poses

    def are_poses_equal(self, a, b):
        return self._phase.env.are_poses_equal(a, b)

    def get_agent_location(self):
        return self._phase.env.get_agent_location()

    @property
    def last_event(self):
        # GT semantic frame the way THOR renders it: class colors
        sem = self._phase.get_observations()["semantic"][..., 0]
        colors = taxonomy.class_colors_array(normalized=False)
        return types.SimpleNamespace(
            semantic_segmentation_frame=colors[sem].astype(np.uint8))


class _ExtTask:
    """What rearrange.tasks yields: THOR's external task surface."""

    def __init__(self, phase):
        self._phase = phase
        self.env = _ExtEnv(phase)

    def get_observations(self):
        o = self._phase.get_observations()
        return {"rgb": o["rgb"], "depth": o["depth"]}

    def step(self, action):
        r = self._phase.step(action)
        return types.SimpleNamespace(
            info={"action_success": r.action_success})

    def is_done(self):
        return self._phase.is_done()

    def action_names(self):
        return self._phase.action_names()

    def metrics(self):
        return self._phase.metrics()


class _SpecIterator:
    """task_spec_iterator contract: next() skips one task spec."""

    def __init__(self, grid):
        self._grid = grid

    def __next__(self):
        self._grid.skip_task()


class _GridBackedSampler:
    """RearrangeTaskSampler stand-in running real grid-world episodes
    (walkthrough task, then the paired unshuffle task, per spec)."""

    def __init__(self, **kwargs):
        cam = kwargs["sensors"][0].height
        self._grid = GridWorldTaskSampler(
            list(range(16)), camera=CameraConfig(cam, cam),
            max_steps=kwargs["max_steps"], **SCENE_KW)
        self.task_spec_iterator = _SpecIterator(self._grid)
        self.length = 32

    @classmethod
    def from_fixed_dataset(cls, **kwargs):
        return cls(**kwargs)

    def next_task(self):
        return _ExtTask(self._grid.next_task())

    def reset(self):
        self._grid.reset()


@pytest.fixture
def fake_thor_grid(monkeypatch):
    def sensor(name):
        def ctor(**kwargs):
            return types.SimpleNamespace(kind=name, **kwargs)
        return ctor

    ai2thor = types.ModuleType("ai2thor")
    platform = types.ModuleType("ai2thor.platform")
    platform.CloudRendering = object()
    ai2thor.platform = platform

    rearrange = types.ModuleType("rearrange")
    sensors = types.ModuleType("rearrange.sensors")
    sensors.RGBRearrangeSensor = sensor("rgb")
    sensors.DepthRearrangeSensor = sensor("depth")
    tasks = types.ModuleType("rearrange.tasks")
    tasks.RearrangeTaskSampler = _GridBackedSampler
    rearrange.sensors = sensors
    rearrange.tasks = tasks

    bc = types.ModuleType("baseline_configs")
    rb = types.ModuleType("baseline_configs.rearrange_base")

    class Base:
        THOR_CONTROLLER_KWARGS = {"quality": "Very Low"}
        REARRANGE_ENV_KWARGS = {"mode": "default"}
        MAX_STEPS = 250
        REQUIRE_DONE_ACTION = True
        FORCE_AXIS_ALIGNED_START = True

        @staticmethod
        def stagewise_task_sampler_args(stage, process_ind,
                                        total_processes, devices):
            return {"scenes_to_allowed_rearrange_inds": {"s": [0]},
                    "seed": 17}

        @staticmethod
        def actions():
            return ("done", "move_ahead")

    rb.RearrangeBaseExperimentConfig = Base
    bc.rearrange_base = rb

    for name, mod in (("ai2thor", ai2thor),
                      ("ai2thor.platform", platform),
                      ("rearrange", rearrange),
                      ("rearrange.sensors", sensors),
                      ("rearrange.tasks", tasks),
                      ("baseline_configs", bc),
                      ("baseline_configs.rearrange_base", rb)):
        monkeypatch.setitem(sys.modules, name, mod)
    yield


COMMON = [
    "--platform", "cpu", "--camera-size", "48",
    "--map-height", "80", "--map-width", "80", "--map-depth", "24",
    "--grid-resolution", "0.125", "--map-slice-start", "0",
    "--map-slice-stop", "12", "--step-size", "2",
    "--obstacle-padding", "2", "--max-goal-steps", "60",
    "--exploration-budget-one", "3", "--exploration-budget-two", "2",
    "--ground-truth-segmentation", "--ground-truth-disagreement",
    "--ground-truth-semantic-search",
    "--confidence-threshold", "0.1", "--distance-threshold", "0.2",
    "--start-task", "0", "--total-tasks", "3",
]

KEYS = ("unshuffle/prop_fixed", "unshuffle/prop_fixed_strict",
        "unshuffle/success", "unshuffle/num_fixed",
        "unshuffle/num_initially_misplaced", "unshuffle/objects_moved")


def _results(logdir, task_id):
    with open(logdir / "results" / f"{task_id}.json") as f:
        return json.load(f)


def test_thor_fleet_slot_skip_ahead(fake_thor_grid, monkeypatch,
                                    tmp_path):
    """Persistent gateway slots skip to their assigned task index:
    with --every-tasks 2 and fleet 2 over tasks (0, 2, 4), slot 0
    serves specs 0 then 4 (skipping 1-3 between batches) and slot 1
    serves spec 2 — observed on the grid-backed sampler's cursor."""
    from mass_tpu.agent import cli
    from mass_tpu.parallel import evaluator as ev

    captured = []

    class _StubEvaluator:
        def __init__(self, config, samplers, seeds=None, **kw):
            captured.append(
                [s._sampler._grid._cursor for s in samplers])
            self._samplers = samplers
            for s in samplers:      # consume the spec like an episode
                s.next_task()
                s.next_task()

        def run(self):
            return [{"unshuffle/prop_fixed_strict": 0.0,
                     "unshuffle/success": 0.0}
                    for _ in self._samplers]

    monkeypatch.setattr(ev, "FleetEvaluator", _StubEvaluator)
    args = cli.build_parser().parse_args(
        COMMON + ["--backend", "thor", "--fleet-size", "2",
                  "--every-tasks", "2",
                  "--logdir", str(tmp_path)])
    results = cli.run_fleet(args, cli.config_from_args(args))

    assert captured == [[0, 2], [4]]
    assert [r["task_id"] for r in results] == [0, 2, 4]


@pytest.mark.slow
def test_thor_fleet_cli_matches_sequential_gateway(fake_thor_grid,
                                                   tmp_path):
    """--backend thor --fleet-size 2 over 3 tasks: per-task outcomes
    identical to the sequential gateway driver (including the
    skip-ahead batch, where slot 0 serves tasks 0 then 2), and to the
    plain grid-world driver on the same scenes (lossless gateway)."""
    from mass_tpu.agent import cli

    thor = COMMON + ["--backend", "thor"]
    cli.main(thor + ["--logdir", str(tmp_path / "fleet"),
                     "--fleet-size", "2"])
    cli.main(thor + ["--logdir", str(tmp_path / "seq")])
    grid = COMMON + [
        "--backend", "gridworld",
        "--num-objects", str(SCENE_KW["num_objects"]),
        "--num-misplaced", str(SCENE_KW["num_misplaced"]),
        "--num-opened", str(SCENE_KW["num_opened"]),
        "--logdir", str(tmp_path / "grid")]
    cli.main(grid)

    for s in range(3):
        got = _results(tmp_path / "fleet", s)
        want = _results(tmp_path / "seq", s)
        plain = _results(tmp_path / "grid", s)
        for k in KEYS:
            assert got[k] == want[k], (s, k, got[k], want[k])
            assert got[k] == plain[k], (s, k, got[k], plain[k])

    # the episodes actually rearranged something on at least one seed
    assert any(_results(tmp_path / "fleet", s)["unshuffle/num_fixed"]
               for s in range(3))
