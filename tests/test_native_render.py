"""Parity of the native C++ grid-world render core vs the numpy path.

The env engine's ray-vs-AABB renderer has two implementations: the
ctypes-loaded C++ core (mass_tpu/native/gridworld_render.cpp — the
analogue of the reference's native Unity engine, SURVEY.md §2.2 L0)
and the numpy fallback in env/gridworld.py.  Both evaluate the same
double-precision math, so depth must agree to float32 round-off and
the semantic/instance ids must match except on knife-edge rays where
the BLAS vs scalar rotation differs in the last ulp.
"""

import numpy as np
import pytest

from mass_tpu.config import CameraConfig
from mass_tpu.env import gridworld as gw
from mass_tpu.env.protocol import AgentPose


def _random_world(rng, n_objects=8, room=6.0):
    objs = []
    for k in range(n_objects):
        pos = np.asarray([rng.uniform(0.5, room - 0.5),
                          0.0,
                          rng.uniform(0.5, room - 0.5)])
        size = rng.uniform(0.15, 0.9, 3)
        objs.append(gw.ObjectInstance(
            name=f"obj{k}", class_id=int(rng.randint(1, 54)),
            position=pos, size=size,
            tint=rng.uniform(0.4, 1.0, 3).astype(np.float32)))
    return gw.GridWorld((room, 2.5, room), objs)


def _render_both(world, cam, pose, monkeypatch):
    native_fn = gw._native_renderer()
    if native_fn is None:
        pytest.skip("native toolchain unavailable")
    native = world.render(cam, pose)
    monkeypatch.setattr(gw, "_NATIVE_RENDER", None)
    fallback = world.render(cam, pose)
    monkeypatch.setattr(gw, "_NATIVE_RENDER", native_fn)
    return native, fallback


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(seed, monkeypatch):
    rng = np.random.RandomState(seed)
    world = _random_world(rng)
    cam = CameraConfig(height=40, width=40)
    pose = AgentPose(x=float(rng.uniform(1, 5)), y=0.0,
                     z=float(rng.uniform(1, 5)),
                     rotation_degrees=float(rng.choice([0, 37, 90, 215])),
                     horizon_degrees=float(rng.choice([-30, 0, 30])),
                     standing=bool(rng.randint(2)))
    (rgb_n, d_n, s_n), (rgb_f, d_f, s_f) = _render_both(
        world, cam, pose, monkeypatch)

    # ids identical except (rare) knife-edge rays; depth to round-off
    mismatch = (s_n != s_f).mean()
    assert mismatch <= 1e-3, f"semantic mismatch rate {mismatch}"
    agree = (s_n == s_f)[..., 0]
    np.testing.assert_allclose(d_n[agree], d_f[agree], rtol=1e-6)
    np.testing.assert_allclose(rgb_n[agree], rgb_f[agree], atol=1e-6)
    assert d_n.dtype == np.float32 and s_n.dtype == np.int32


def test_native_empty_room(monkeypatch):
    world = gw.GridWorld((4.0, 2.5, 4.0), [])
    cam = CameraConfig(height=16, width=16)
    pose = AgentPose(x=2.0, y=0.0, z=2.0, rotation_degrees=0.0,
                     horizon_degrees=0.0, standing=True)
    (rgb_n, d_n, s_n), (rgb_f, d_f, s_f) = _render_both(
        world, cam, pose, monkeypatch)
    np.testing.assert_array_equal(s_n, s_f)
    np.testing.assert_allclose(d_n, d_f, rtol=1e-6)
    assert (s_n == 0).all()            # walls/floor everywhere
    # lower half of the frame looks at floor/walls: must hit (the room
    # has no ceiling box, so upward rays may legitimately miss)
    assert (d_n[8:] > 0).all()


def test_native_disabled_by_env(monkeypatch):
    from mass_tpu import native
    monkeypatch.setenv("MASS_TPU_NO_NATIVE", "1")
    assert native.load("gridworld_render") is None


def test_native_unknown_library_is_none():
    from mass_tpu import native
    assert native.load("no_such_component") is None


def test_native_stale_so_without_source(tmp_path, monkeypatch):
    """A leftover .so whose .cpp source vanished must fall back to
    None, not crash (the fallback contract of native.load)."""
    from mass_tpu import native
    (tmp_path / "_ghost.so").write_bytes(b"not a real library")
    monkeypatch.setattr(native, "_DIR", str(tmp_path))
    monkeypatch.setattr(native, "_CACHE", {})
    assert native.load("ghost") is None
