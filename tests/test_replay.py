"""Recorded-trajectory replay: a live grid-world episode serialized to
disk replays bit-identically through the full map pipeline (SURVEY.md
§4.2; observation contract of base_projection_layer.py:282-306)."""

import numpy as np
import pytest

from mass_tpu import taxonomy
from mass_tpu.config import CameraConfig, NavConfig
from mass_tpu.env.rearrange import GridWorldTaskSampler
from mass_tpu.env.replay import ReplayTask, TrajectoryRecorder
from mass_tpu.maps import MapSet, SemanticMap
from mass_tpu.nav.controller import NavigationController

CAM = CameraConfig(height=32, width=32)
GEO = dict(map_height=64, map_width=64, map_depth=16,
           grid_resolution=0.125)


def _drive(task, steps=30):
    """Deterministic rollout folding frames into a semantic map."""
    maps = MapSet(semantic0=SemanticMap(CAM, taxonomy.NUM_CLASSES,
                                        **GEO))
    loc = task.agent_location()
    maps.reset_all((loc.x, loc.z, loc.y))
    controller = NavigationController(
        task, "semantic0", maps,
        NavConfig(step_size=2, obstacle_padding=1, map_slice_start=0,
                  map_slice_stop=8), rng=np.random.RandomState(0))
    names = task.action_names()
    pattern = [names.index("move_ahead")] * 3 + \
        [names.index("rotate_left")]
    taken = []
    for i in range(steps):
        obs = task.get_observations()
        controller.process_observations(obs, update_map=["semantic0"])
        action = pattern[i % len(pattern)]
        task.step(action)
        taken.append(action)
    obs = task.get_observations()
    controller.process_observations(obs, update_map=["semantic0"])
    return np.asarray(maps["semantic0"].voxel_map.data), taken


def test_record_then_replay_reproduces_map(tmp_path):
    sampler = GridWorldTaskSampler([7], camera=CAM)
    live = sampler.next_task()
    rec = TrajectoryRecorder(live)
    live_map, actions = _drive(rec)
    path = rec.save(str(tmp_path / "episode.npz"))

    replay = ReplayTask(path)
    assert len(replay) == len(actions)
    replay_map, _ = _drive(replay, steps=len(actions))
    np.testing.assert_allclose(replay_map, live_map, atol=1e-6)
    assert float(live_map.sum()) > 0


def test_replay_strict_divergence(tmp_path):
    sampler = GridWorldTaskSampler([7], camera=CAM)
    rec = TrajectoryRecorder(sampler.next_task())
    names = rec.action_names()
    rec.get_observations()
    rec.step(names.index("move_ahead"))
    rec.step(names.index("rotate_left"))
    path = rec.save(str(tmp_path / "e.npz"))

    replay = ReplayTask(path)
    replay.step(names.index("move_ahead"))          # matches
    with pytest.raises(ValueError, match="divergence"):
        replay.step(names.index("move_ahead"))      # recorded: rotate
    loose = ReplayTask(path, strict=False)
    assert loose.step(names.index("done")).action_success in (True,
                                                              False)


def test_capture_verify_diff_cli(tmp_path, capsys):
    """The one-command THOR-parity workflow, gridworld standing in for
    THOR: capture -> digest -> diff (VERDICT r4 item 9)."""
    from mass_tpu.env import replay as R

    out_a = str(tmp_path / "a.npz")
    out_b = str(tmp_path / "b.npz")
    geo_flags = ["--camera-size", "32", "--map-height", "64",
                 "--map-width", "64", "--map-depth", "16",
                 "--grid-resolution", "0.125",
                 "--ground-truth-segmentation"]
    R.main(["capture", "--out", out_a, "--frames", "12"] + geo_flags)
    R.main(["capture", "--out", out_b, "--frames", "12"] + geo_flags)
    capsys.readouterr()

    # identical seeds/script -> identical captures
    assert R.diff_captures(out_a, out_b) == []
    R.main(["diff", out_a, out_b])
    assert "IDENTICAL" in capsys.readouterr().out

    # the digest replays through the map pipeline and is deterministic
    d1 = R.replay_digest(out_a, geo_flags)
    d2 = R.replay_digest(out_b, geo_flags)
    assert d1 == d2
    assert d1["map_semantic"]["nonzero"] > 0
    assert d1["map_occupancy"]["sum"] > 0
    assert len(d1["actions"]) == 12

    # a different scene diverges loudly, in the capture AND the digest
    out_c = str(tmp_path / "c.npz")
    R.main(["capture", "--out", out_c, "--frames", "12",
            "--start-task", "3"] + geo_flags)
    capsys.readouterr()
    assert R.diff_captures(out_a, out_c) != []
    d3 = R.replay_digest(out_c, geo_flags)
    assert d3["streams"]["semantic"] != d1["streams"]["semantic"]


def test_pose_to_map_args_matches_controller():
    """The replay pose transform is the controller's, bit for bit —
    drift here would silently invalidate THOR parity fixtures."""
    from mass_tpu.env.replay import pose_to_map_args
    from mass_tpu.maps import MapSet
    from mass_tpu.nav.controller import NavigationController

    sampler = GridWorldTaskSampler([7], camera=CAM)
    task = sampler.next_task()
    maps = MapSet(semantic0=SemanticMap(CAM, taxonomy.NUM_CLASSES,
                                        **GEO))
    loc = task.agent_location()
    maps.reset_all((loc.x, loc.z, loc.y))
    controller = NavigationController(
        task, "semantic0", maps,
        NavConfig(step_size=2, obstacle_padding=1, map_slice_start=0,
                  map_slice_stop=8), rng=np.random.RandomState(0))
    for action in ("move_ahead", "rotate_left", "look_down"):
        position, yaw, elevation = pose_to_map_args(
            task.agent_location())
        np.testing.assert_array_equal(position,
                                      controller.process_position())
        assert yaw == controller.process_yaw()
        assert elevation == controller.process_elevation()
        task.step(task.action_names().index(action))


def test_replay_pose_and_done_streams(tmp_path):
    sampler = GridWorldTaskSampler([7], camera=CAM)
    live = sampler.next_task()
    rec = TrajectoryRecorder(live)
    names = rec.action_names()
    p0 = rec.agent_location()
    rec.get_observations()
    rec.step(names.index("move_ahead"))
    p1_live = live.agent_location()
    path = rec.save(str(tmp_path / "e.npz"))

    replay = ReplayTask(path)
    assert not replay.is_done()
    r0 = replay.agent_location()
    assert (r0.x, r0.z, r0.rotation_degrees) == (p0.x, p0.z,
                                                 p0.rotation_degrees)
    replay.step(names.index("move_ahead"))
    r1 = replay.agent_location()
    assert (r1.x, r1.z) == (p1_live.x, p1_live.z)
