"""THOR-gateway contract tests against a mocked rearrangement stack.

No THOR host ships in this image, so ``env/thor.py`` +
``env/_thor_config.py`` are exercised against fakes implementing
exactly the external surface they touch (RearrangeTaskSampler
construction args, sensor uuids, observation/step/pose adaptation —
reference: mass/thor/segmentation_config.py:398-481 and the allenai
rearrange package)."""

import sys
import types

import numpy as np
import pytest

from mass_tpu import taxonomy
from mass_tpu.env.protocol import AgentPose


class _FakeEnv:
    def __init__(self):
        self.poses = ([], [], [])
        self.last_event = types.SimpleNamespace(
            semantic_segmentation_frame=self._frame())

    @staticmethod
    def _frame():
        colors = taxonomy.class_colors_array(normalized=False).astype(
            np.uint8)
        frame = np.zeros((4, 4, 3), np.uint8)
        frame[0, 0] = colors[7]
        frame[1, 1] = colors[12]
        frame[2, 2] = (9, 9, 9)      # unknown color -> class 0
        return frame

    def get_agent_location(self):
        return dict(x=1.5, y=0.9, z=-2.0, rotation=90.0, horizon=30.0,
                    standing=False)

    def are_poses_equal(self, a, b):
        return True


class _FakeTask:
    def __init__(self, with_semantic=False):
        self.env = _FakeEnv()
        self._with_semantic = with_semantic
        self.stepped = []

    def get_observations(self):
        obs = {"rgb": np.zeros((4, 4, 3), np.float32),
               "depth": np.ones((4, 4, 1), np.float32)}
        if self._with_semantic:
            obs["semantic"] = np.full((4, 4, 1), 3, np.int32)
        return obs

    def step(self, action):
        self.stepped.append(action)
        return types.SimpleNamespace(info={"action_success": False,
                                           "extra": 1})

    def is_done(self):
        return False

    def action_names(self):
        return ["done", "move_ahead"]

    def metrics(self):
        return {"unshuffle/success": 0.0}


class _FakeSampler:
    captured = None

    def __init__(self, **kwargs):
        _FakeSampler.captured = kwargs
        self.length = 4
        self.task_spec_iterator = iter(range(10))
        self.reset_calls = 0

    @classmethod
    def from_fixed_dataset(cls, **kwargs):
        return cls(**kwargs)

    def next_task(self):
        return _FakeTask()

    def reset(self):
        self.reset_calls += 1


@pytest.fixture
def fake_thor(monkeypatch):
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
    tasks.RearrangeTaskSampler = _FakeSampler
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
    _FakeSampler.captured = None
    yield


def test_sampler_construction_args(fake_thor):
    from mass_tpu.env.thor import ThorTaskSampler
    sampler = ThorTaskSampler(stage="val", ground_truth=True,
                              screen_size=128)
    cap = _FakeSampler.captured
    assert cap["run_walkthrough_phase"] is True
    assert cap["run_unshuffle_phase"] is True
    assert cap["stage"] == "val"
    assert cap["seed"] == 17
    assert cap["max_steps"] == 250
    assert cap["discrete_actions"] == ("done", "move_ahead")
    ck = cap["rearrange_env_kwargs"]["controller_kwargs"]
    assert ck["renderSemanticSegmentation"] is True
    assert ck["renderInstanceSegmentation"] is False
    assert ck["renderDepthImage"] is True
    rgb, depth = cap["sensors"]
    assert (rgb.kind, rgb.uuid, rgb.height) == ("rgb", "rgb", 128)
    assert (depth.kind, depth.uuid, depth.width) == ("depth", "depth",
                                                     128)
    assert len(sampler) == 4


def test_one_phase_sampler_args(fake_thor):
    from mass_tpu.env.thor import ThorTaskSampler
    ThorTaskSampler(one_phase=True)
    assert _FakeSampler.captured["run_walkthrough_phase"] is False
    assert _FakeSampler.captured["run_unshuffle_phase"] is True


def test_task_adaptation_gt_colors(fake_thor):
    from mass_tpu.env.thor import ThorTaskSampler
    task = ThorTaskSampler().next_task()
    obs = task.get_observations()
    assert obs["rgb"].dtype == np.float32
    assert obs["depth"].shape == (4, 4, 1)
    sem = obs["semantic"][..., 0]
    assert sem[0, 0] == 7 and sem[1, 1] == 12
    assert sem[2, 2] == 0                   # unknown -> OccupiedSpace

    result = task.step(1)
    assert result.action_success is False
    assert result.info["extra"] == 1

    loc = task.agent_location()
    assert isinstance(loc, AgentPose)
    assert (loc.x, loc.z, loc.rotation_degrees) == (1.5, -2.0, 90.0)
    assert loc.horizon_degrees == 30.0 and loc.standing is False
    assert task.metrics() == {"unshuffle/success": 0.0}
    assert task.action_names() == ["done", "move_ahead"]


def test_skip_and_reset(fake_thor):
    from mass_tpu.env.thor import ThorTaskSampler
    sampler = ThorTaskSampler()
    sampler.skip_task()
    assert next(sampler._sampler.task_spec_iterator) == 1
    sampler.reset()
    assert sampler._sampler.reset_calls == 1


def test_one_phase_goal_observations(fake_thor):
    """One-phase tasks surface the goal world's render from the same
    pose as goal_rgb / goal_depth / goal_semantic (the reference's dual
    semantic sensors, segmentation_config.py:545-561), matching the
    grid-world one-phase observation contract."""
    from mass_tpu.env.thor import ThorTaskSampler

    colors = taxonomy.class_colors_array(normalized=False).astype(
        np.uint8)
    goal_sem = np.zeros((4, 4, 3), np.uint8)
    goal_sem[3, 3] = colors[21]
    goal_event = types.SimpleNamespace(
        frame=np.full((4, 4, 3), 128, np.uint8),
        depth_frame=np.full((4, 4), 2.5, np.float32),
        semantic_segmentation_frame=goal_sem)

    sampler = ThorTaskSampler(one_phase=True)
    task = sampler.next_task()
    task._task.walkthrough_env = types.SimpleNamespace(
        last_event=goal_event)

    obs = task.get_observations()
    assert obs["goal_rgb"].dtype == np.float32
    np.testing.assert_allclose(obs["goal_rgb"], 128 / 255.0)
    assert obs["goal_depth"].shape == (4, 4, 1)
    np.testing.assert_allclose(obs["goal_depth"][..., 0], 2.5)
    gsem = obs["goal_semantic"][..., 0]
    assert gsem[3, 3] == 21 and gsem[0, 0] == 0
    # two-phase tasks never pay the goal render
    two = ThorTaskSampler().next_task()
    assert "goal_rgb" not in two.get_observations()


def test_pose_conventions_crouch_and_horizon(fake_thor):
    """Controller pose extraction over the gateway: yaw = pi/2 - rot,
    elevation = -horizon, crouching agents subtract the 0.675 m camera
    offset (reference: mass/navigation_policy.py:78-132) — including
    the horizon extremes (+60 look-down, -30 look-up)."""
    from mass_tpu.env.thor import ThorTaskSampler
    from mass_tpu.nav.controller import NavigationController, \
        CROUCH_HEIGHT_OFFSET

    task = ThorTaskSampler().next_task()
    ctrl = object.__new__(NavigationController)   # pose methods only
    ctrl.task = task

    for rot, horizon, standing in ((0.0, 60.0, True),
                                   (90.0, -30.0, False),
                                   (270.0, 0.0, False)):
        task._task.env.get_agent_location = lambda: dict(
            x=1.5, y=0.9, z=-2.0, rotation=rot, horizon=horizon,
            standing=standing)
        pos = ctrl.process_position()
        yaw = ctrl.process_yaw()
        elev = ctrl.process_elevation()
        np.testing.assert_allclose(
            yaw, np.pi / 2 - np.radians(rot), atol=1e-6)
        np.testing.assert_allclose(elev, -np.radians(horizon),
                                   atol=1e-6)
        expect_y = 0.9 - (0.0 if standing else CROUCH_HEIGHT_OFFSET)
        np.testing.assert_allclose(pos, [1.5, -2.0, expect_y],
                                   atol=1e-6)


def test_crash_restart_resumes_mid_episode(fake_thor):
    """A simulator crash mid-run restarts the experiment and SKIPS
    already-completed tasks, the reference's resume discipline
    (reference: mass/utils/experimentation.py:61-74 +
    agent.py:149-151, 661-662)."""
    from mass_tpu.agent.reliability import (SimulatorCrashError,
                                            run_with_restart)
    from mass_tpu.env.thor import ThorTaskSampler

    completed = []
    attempts = {"n": 0}

    def experiment():
        attempts["n"] += 1
        sampler = ThorTaskSampler()
        for task_id in range(4):
            if task_id in completed:
                sampler.skip_task()
                continue
            task = sampler.next_task()
            task.get_observations()
            if attempts["n"] == 1 and task_id == 2:
                raise SimulatorCrashError("unity hung mid-episode")
            task.step(1)
            completed.append(task_id)
        return completed

    out = run_with_restart(experiment)
    assert attempts["n"] == 2
    assert out == [0, 1, 2, 3]          # no task lost, none duplicated
