"""Recorded-trajectory environment: serialize and replay episodes.

The framework's Task seam means a stream of recorded (rgb, depth,
semantic, pose) frames is a complete environment (SURVEY.md §4.2; the
observation contract mirrors the reference's projection-layer input,
reference: mass/nn/base_projection_layer.py:282-306).  Recording a live
episode and replaying it bit-identically removes the simulator from
parity runs — the only path to numeric comparison against real THOR
captures on hosts with no Unity.

    rec = TrajectoryRecorder(task)
    ... drive rec like the task ...
    rec.save("episode.npz")
    replayed = ReplayTask("episode.npz")
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np

from mass_tpu.env.protocol import AgentPose, StepResult

_POSE_FIELDS = ("x", "y", "z", "rotation_degrees", "horizon_degrees",
                "standing")


def _pose_row(pose: AgentPose) -> List[float]:
    return [pose.x, pose.y, pose.z, pose.rotation_degrees,
            pose.horizon_degrees, float(pose.standing)]


class TrajectoryRecorder:
    """Task decorator that captures everything the pipeline consumes.

    Frames are fetched lazily (one render per timestep, repeated
    ``get_observations`` calls within a step return the same frame, as
    live simulators do for an unchanged state)."""

    def __init__(self, task):
        self._task = task
        self.frames: List[Dict[str, np.ndarray]] = []
        self.poses: List[List[float]] = []
        self.actions: List[int] = []
        self.success: List[bool] = []
        self.done: List[bool] = []
        self._t = 0

    def get_observations(self) -> Dict[str, Any]:
        if len(self.frames) <= self._t:
            obs = self._task.get_observations()
            self.frames.append({
                k: np.asarray(v) for k, v in obs.items()
                if isinstance(v, (np.ndarray, list)) or hasattr(
                    v, "__array__")})
            self.poses.append(_pose_row(self._task.agent_location()))
        return dict(self.frames[self._t])

    def step(self, action: int) -> StepResult:
        self.get_observations()          # ensure pre-step frame exists
        result = self._task.step(action)
        self.actions.append(int(action))
        self.success.append(bool(result.action_success))
        self.done.append(bool(self._task.is_done()))
        self._t += 1
        return result

    def __getattr__(self, name):
        return getattr(self._task, name)

    def save(self, path: str) -> str:
        self.get_observations()          # final frame
        keys = sorted(self.frames[0])
        arrays = {f"frame_{k}": np.stack([f[k] for f in self.frames])
                  for k in keys}
        meta = dict(action_names=self._task.action_names(),
                    frame_keys=keys)
        np.savez_compressed(
            path, poses=np.asarray(self.poses, np.float64),
            actions=np.asarray(self.actions, np.int64),
            success=np.asarray(self.success, bool),
            done=np.asarray(self.done, bool),
            meta=np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8),
            **arrays)
        return path


class ReplayTask:
    """Task-protocol playback of a recorded episode.

    ``strict`` asserts the caller takes exactly the recorded actions —
    a deterministic agent replayed on its own trajectory must agree;
    disagreement means the pipeline drifted."""

    def __init__(self, path: str, strict: bool = True):
        data = np.load(path)
        meta = json.loads(bytes(data["meta"]).decode())
        self._action_names = meta["action_names"]
        self._frames = {k: data[f"frame_{k}"]
                        for k in meta["frame_keys"]}
        self._poses = data["poses"]
        self._actions = data["actions"]
        self._success = data["success"]
        self._done = data["done"]
        self.strict = strict
        self._t = 0

    def __len__(self) -> int:
        return int(self._actions.shape[0])

    def get_observations(self) -> Dict[str, Any]:
        t = min(self._t, self._poses.shape[0] - 1)
        return {k: v[t] for k, v in self._frames.items()}

    def step(self, action: int) -> StepResult:
        t = self._t
        if t >= self._actions.shape[0]:
            return StepResult(action_success=False,
                              info=dict(exhausted=True))
        if self.strict and int(action) != int(self._actions[t]):
            raise ValueError(
                f"replay divergence at step {t}: recorded action "
                f"{self._action_names[self._actions[t]]}, got "
                f"{self._action_names[action]}")
        self._t += 1
        return StepResult(action_success=bool(self._success[t]))

    def is_done(self) -> bool:
        if self._t == 0:
            return False
        if self._t > self._actions.shape[0]:
            return True
        return bool(self._done[min(self._t, len(self._done)) - 1])

    def action_names(self) -> List[str]:
        return list(self._action_names)

    def agent_location(self) -> AgentPose:
        t = min(self._t, self._poses.shape[0] - 1)
        row = self._poses[t]
        return AgentPose(x=float(row[0]), y=float(row[1]),
                         z=float(row[2]), rotation_degrees=float(row[3]),
                         horizon_degrees=float(row[4]),
                         standing=bool(row[5]))


def record_episode(task, path: str, actions: Optional[List[int]] = None,
                   max_steps: int = 100) -> TrajectoryRecorder:
    """Drive ``task`` with an explicit action list (or until done) while
    recording; convenience for building replay fixtures."""
    rec = TrajectoryRecorder(task)
    for i in range(max_steps if actions is None else len(actions)):
        rec.get_observations()
        if rec.is_done():
            break
        a = actions[i] if actions is not None else 0
        rec.step(a)
    rec.save(path)
    return rec
