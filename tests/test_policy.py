"""Tests for the semantic-search policy: architecture parity with the
reference torch network, sampling head, and the (new) trainer."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mass_tpu.search import policy as pol
from mass_tpu.search import train as ptrain


def _torch_net():
    import torch.nn as nn
    layers = []
    cin = 54
    for _ in range(4):
        layers += [nn.Conv2d(cin, 64, 3, padding=1),
                   nn.GroupNorm(1, 64), nn.ReLU()]
        cin = 64
    layers.append(nn.Conv2d(64, 1, 3, padding=1))
    return nn.Sequential(*layers)


def test_forward_shape():
    params = pol.init_params(jax.random.PRNGKey(0), 32, 40)
    out = pol.goal_logits(params, jnp.zeros((2, 32, 40, 54)))
    assert out.shape == (2, 32 * 40)


def test_torch_checkpoint_parity():
    """Random torch weights imported into flax must reproduce the torch
    network's output (validates the policy.pth import path)."""
    import torch
    torch.manual_seed(0)
    net = _torch_net().eval()
    params = pol.params_from_torch_state_dict(net.state_dict())

    x = np.random.RandomState(1).randn(1, 16, 20, 54).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(pol.SearchPolicy().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sample_goal_cell_in_bounds_and_biased():
    h, w = 12, 16
    params = pol.init_params(jax.random.PRNGKey(0), h, w)
    # force a strong peak by feeding a map with one hot column and
    # checking samples are valid cells
    td = jnp.zeros((1, h, w, 54))
    cells = []
    for i in range(20):
        c = np.asarray(pol.sample_goal_cell(
            params, td, jax.random.PRNGKey(i)))[0]
        assert 0 <= c[0] < w and 0 <= c[1] < h and c[2] == 0
        cells.append(tuple(c))
    assert len(set(cells)) > 1  # uniform-ish logits -> varied samples


def test_train_step_decreases_loss():
    rng = jax.random.PRNGKey(2)
    h, w = 12, 16
    state, tx = ptrain.create_train_state(rng, h, w, 54,
                                          learning_rate=1e-2)
    td = jax.random.uniform(jax.random.PRNGKey(3), (4, h, w, 54))
    goals = jnp.asarray([[3, 4], [10, 2], [7, 7], [0, 0]])

    step = jax.jit(lambda s, x, y: ptrain.train_step(s, tx, x, y))
    losses = []
    for _ in range(30):
        state, loss = step(state, td, goals)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_reference_policy_checkpoint_parity():
    """The shipped policy.pth (if present) produces the same scores
    through the flax import path as through torch — full behavioral
    parity of the semantic-search policy."""
    import os
    import pytest
    import torch
    path = "/root/reference/policy.pth"
    if not os.path.exists(path):
        pytest.skip("reference checkpoint unavailable")
    state = torch.load(path, map_location="cpu", weights_only=True)

    net = _torch_net().eval()
    net.load_state_dict(state)
    params = pol.load_reference_policy(path)

    x = np.random.RandomState(7).rand(1, 24, 24, 54).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(pol.SearchPolicy().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_smoothed_cross_entropy_minimized_at_goal():
    """The sigma>0 target is a normalized heat map centred on the goal
    cell: logits peaked exactly there must score (much) better than
    logits peaked elsewhere, and sigma=0 must reduce to the point NLL."""
    params = pol.init_params(jax.random.PRNGKey(0), 16, 16, 3)
    top = jnp.zeros((1, 16, 16, 3))
    goal = jnp.asarray([[5, 7]], jnp.int32)
    point = ptrain.goal_cross_entropy(params, top, goal, sigma=0.0)
    flat = 7 * 16 + 5
    logits = pol.goal_logits(params, top)
    want = -jax.nn.log_softmax(logits, -1)[0, flat]
    np.testing.assert_allclose(float(point), float(want), rtol=1e-5)

    smoothed = ptrain.goal_cross_entropy(params, top, goal, sigma=2.0)
    assert np.isfinite(float(smoothed))
    # a uniform-logit policy pays ~log(H*W) under both losses
    assert abs(float(smoothed) - float(point)) < 1.0


def test_dihedral_augmentation_consistent():
    """Every symmetry must keep the goal cell on the same map feature:
    mark the goal cell in the input and check the transformed mark sits
    at the transformed coordinates."""
    rng = np.random.RandomState(0)
    # non-square map: rotations swap height/width, so the coordinate
    # update must track the CURRENT width, not the original
    for shape in ((8, 8, 2), (6, 10, 2)):
        top = rng.uniform(size=shape).astype(np.float32)
        cell = np.asarray([2, 5], np.int32)      # (x, y)
        top = top.copy()
        top[cell[1], cell[0], 0] = 77.0          # tag the goal cell
        for k in range(4):
            for flip in (False, True):
                t, c = ptrain._dihedral(top, cell, k, flip)
                assert 0 <= c[0] < t.shape[1], (shape, k, flip, c)
                assert 0 <= c[1] < t.shape[0], (shape, k, flip, c)
                assert t[c[1], c[0], 0] == 77.0, (shape, k, flip, c)


def test_fit_data_parallel_on_mesh(tmp_path):
    """fit(data_parallel=True) shards batches over the 8-device CPU
    mesh (params replicated, grads psum'd by jit) and converges the
    same direction as the single-device path on a tiny dataset."""
    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    d.mkdir()
    for tid in range(4):
        np.savez_compressed(
            d / f"task-{tid}.npz",
            tops0=rng.uniform(size=(2, 16, 16, 3)).astype(np.float16),
            cells0=rng.randint(0, 16, (1, 2)).astype(np.int32),
            tops1=rng.uniform(size=(1, 16, 16, 3)).astype(np.float16),
            cells1=rng.randint(0, 16, (1, 2)).astype(np.int32))
    nll, dist = ptrain.fit(str(d), str(tmp_path / "ckpt"), steps=12,
                           batch_size=8, val_fraction=0.25,
                           log_every=6, data_parallel=True)
    assert np.isfinite(nll) and np.isfinite(dist)
    from mass_tpu.utils.checkpoint import load_pytree
    params = load_pytree(str(tmp_path / "ckpt"))
    logits = pol.goal_logits(params, jnp.zeros((1, 16, 16, 3)))
    assert np.isfinite(np.asarray(logits)).all()


def test_input_channels_detects_conditioned():
    plain = pol.init_params(jax.random.PRNGKey(0), 16, 16, 54)
    cond = pol.init_params(jax.random.PRNGKey(0), 16, 16, 108)
    assert pol.input_channels(plain) == 54
    assert pol.input_channels(cond) == 108


def _write_tiny_dataset(d, n_tasks=4, c=3, g0=2, g1=2, k=2):
    rng = np.random.RandomState(0)
    d.mkdir(exist_ok=True)
    for tid in range(n_tasks):
        np.savez_compressed(
            d / f"task-{tid}.npz",
            tops0=rng.uniform(size=(g0, 16, 16, c)).astype(np.float16),
            cells0=rng.randint(0, 16, (k, 2)).astype(np.int32),
            tops1=rng.uniform(size=(g1, 16, 16, c)).astype(np.float16),
            cells1=rng.randint(0, 16, (k, 2)).astype(np.int32))


def test_conditioned_loader_wiring(tmp_path):
    """Unshuffle samples must carry the task's FINAL walkthrough
    snapshot as the context half and target BOTH walkthrough and
    current cells (the revisit mechanism's learnable signal);
    walkthrough samples keep a zero context and cells0 targets."""
    d = tmp_path / "data"
    _write_tiny_dataset(d, n_tasks=2, c=3, g0=2, g1=1, k=2)
    src = ptrain.load_dataset_conditioned(str(d))
    # per task: 2 walkthrough snaps x 2 cells0
    #         + 1 unshuffle snap x (2 cells0 + 2 cells1)
    assert len(src) == 2 * (2 * 2 + 1 * 4)
    assert src.shape == (16, 16, 6)
    with np.load(d / "task-0.npz") as z:
        ctx0, t1 = z["tops0"][-1], z["tops1"][0]
        c0, c1 = z["cells0"], z["cells1"]
    # first four samples of task 0 are walkthrough: zero context
    s = src.top(0)
    assert s.shape == (16, 16, 6)
    assert np.all(s[..., 3:] == 0)
    # unshuffle samples (4-7 of task 0) carry tops0[-1] and the
    # cells0-then-cells1 target union
    s = src.top(4)
    np.testing.assert_array_equal(s[..., :3], t1)
    np.testing.assert_array_equal(s[..., 3:], ctx0)
    np.testing.assert_array_equal(src.cells[4:8],
                                  np.concatenate([c0, c1]))


def test_device_dihedral_matches_host():
    """The on-device dihedral (device-resident batch assembly) must
    reproduce the host _dihedral for all 8 square symmetries, images
    and goal cells alike."""
    rng = np.random.RandomState(0)
    top = rng.uniform(size=(10, 10, 3)).astype(np.float32)
    cell = np.asarray([2, 7], np.int32)
    for k in range(4):
        for flip in (False, True):
            want_img, want_cell = ptrain._dihedral(top, cell, k, flip)
            got = np.asarray(ptrain._device_dihedral(
                jnp.asarray(top), jnp.asarray(k), jnp.asarray(flip)))
            np.testing.assert_array_equal(got, want_img)
            np.testing.assert_array_equal(
                ptrain._dihedral_cell(cell, k, flip, 10, 10), want_cell)


def test_assemble_conditioned_matches_source(tmp_path):
    """Device batch assembly == the host source's concat (identity
    augmentation), including the zero context of walkthrough samples."""
    d = tmp_path / "data"
    _write_tiny_dataset(d, n_tasks=2, c=3, g0=2, g1=1, k=2)
    src = ptrain.load_dataset_conditioned(str(d))
    ids = np.asarray([0, 4, 9])
    out = np.asarray(ptrain._assemble_conditioned(
        jnp.asarray(src._snaps), jnp.asarray(src._ctxs),
        jnp.asarray(src._si[ids]), jnp.asarray(src._ci[ids]),
        jnp.zeros(3, jnp.int32), jnp.zeros(3, bool)))
    want = np.stack([src.top(i) for i in ids]).astype(np.float32)
    np.testing.assert_allclose(out, want)


def test_fit_conditioned(tmp_path):
    """--conditioned end to end: trains, saves, and the checkpoint's
    first conv takes 2C input channels (the agent's auto-detect key)."""
    d = tmp_path / "data"
    _write_tiny_dataset(d, n_tasks=4, c=3)
    nll, dist = ptrain.fit(str(d), str(tmp_path / "ckpt"), steps=8,
                           batch_size=4, val_fraction=0.25,
                           log_every=4, conditioned=True)
    assert np.isfinite(nll) and np.isfinite(dist)
    from mass_tpu.utils.checkpoint import load_pytree
    params = load_pytree(str(tmp_path / "ckpt"))
    assert pol.input_channels(params) == 6
    logits = pol.goal_logits(params, jnp.zeros((1, 16, 16, 6)))
    assert np.isfinite(np.asarray(logits)).all()


def test_agent_conditioned_policy_goal():
    """A 108-channel checkpoint flips the agent into conditioned mode:
    unshuffle goals run the concat head and land inside the map."""
    from mass_tpu.agent.loop import RearrangementAgent
    from mass_tpu.config import AgentConfig, CameraConfig, NavConfig

    cam = CameraConfig(height=16, width=16)
    cfg = AgentConfig(
        camera=cam, map_height=32, map_width=32, map_depth=8,
        grid_resolution=0.125,
        nav=NavConfig(step_size=2, obstacle_padding=2,
                      map_slice_start=0, map_slice_stop=4),
        semantic_search_unshuffle=True)
    params = pol.init_params(jax.random.PRNGKey(0), 32, 32, 108)
    agent = RearrangementAgent(cfg, sampler=None, policy_params=params,
                               rng=np.random.RandomState(0))
    assert agent._policy_conditioned
    goal = agent._policy_goal("semantic1")
    assert goal.shape == (3,)
    assert np.isfinite(goal).all()
    # a plain 54-channel checkpoint keeps the reference head
    plain = pol.init_params(jax.random.PRNGKey(0), 32, 32, 54)
    agent2 = RearrangementAgent(cfg, sampler=None, policy_params=plain,
                                rng=np.random.RandomState(0))
    assert not agent2._policy_conditioned
    goal2 = agent2._policy_goal("semantic0")
    assert np.isfinite(goal2).all()


def test_policy_inhibition_radius_spreads_goals():
    """With --policy-inhibition-radius r, consecutive policy goals in a
    phase are guaranteed > r map cells apart (masked cells carry zero
    probability), for both the plain and conditioned heads."""
    from mass_tpu.agent.loop import RearrangementAgent
    from mass_tpu.config import AgentConfig, CameraConfig, NavConfig

    cam = CameraConfig(height=16, width=16)
    for channels, name in ((54, "semantic0"), (108, "semantic1")):
        cfg = AgentConfig(
            camera=cam, map_height=32, map_width=32, map_depth=8,
            grid_resolution=0.125,
            nav=NavConfig(step_size=2, obstacle_padding=2,
                          map_slice_start=0, map_slice_stop=4),
            semantic_search_unshuffle=True,
            policy_inhibition_radius=6.0)
        params = pol.init_params(jax.random.PRNGKey(0), 32, 32,
                                 channels)
        agent = RearrangementAgent(cfg, sampler=None,
                                   policy_params=params,
                                   rng=np.random.RandomState(0))
        for _ in range(3):
            agent._policy_goal(name)
        cells = np.stack(agent._policy_goal_cells[name])
        assert len(cells) == 3
        for i in range(len(cells)):
            for j in range(i + 1, len(cells)):
                d = np.hypot(*(cells[i] - cells[j]))
                assert d > 6.0, (channels, cells)


@pytest.mark.slow
def test_dataset_collector_custom_geometry(tmp_path):
    """The collector honors non-default map geometry (the scaling path
    toward the reference's production 384x384 maps): snapshots come out
    at the requested shape and labels land inside the map."""
    from mass_tpu.env.rearrange import GridWorldTaskSampler
    from mass_tpu.search import dataset as sdata

    cfg = sdata.small_scene_config(
        32, map_height=96, map_width=96, map_depth=16,
        grid_resolution=0.125, step_size=2, obstacle_padding=2,
        map_slice_start=0, map_slice_stop=8)
    sampler = GridWorldTaskSampler(
        [7], camera=cfg.camera, max_steps=120, num_objects=2,
        num_misplaced=1, num_opened=0)
    data = sdata.collect_task(sampler, cfg, np.random.RandomState(0))
    assert data["tops0"].shape[1:] == (96, 96, 54)
    assert data["tops1"].shape[1:] == (96, 96, 54)
    for key in ("cells0", "cells1"):
        cells = data[key]
        assert cells.shape[-1] == 2
        assert (cells >= 0).all() and (cells < 96).all()
