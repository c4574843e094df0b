"""Trainer for the semantic-search policy.

The reference ships a pre-trained ``policy.pth`` but NOT the training
loop (reference: README.md:15-18); only the label-dump script
(get_search_labels.py) exists.  This module supplies the missing piece:
supervised training of the goal heat-map from (top-down semantic map,
goal-cell) pairs — cross-entropy of the softmax-over-cells against the
labeled goal cell, which makes the sampling distribution used at
inference (agent.py:330-339) concentrate on labeled goals.

Designed for pjit data parallelism: ``train_step`` is pure, takes a
batch, and is safe to shard over a mesh "data" axis (gradients reduce
via jit's automatic collectives when params are replicated).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mass_tpu.search.policy import SearchPolicy, goal_logits


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def create_train_state(rng: jax.Array, height: int, width: int,
                       channels: int, learning_rate: float = 3e-4,
                       weight_decay: float = 0.0,
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = SearchPolicy().init(
        rng, jnp.zeros((1, height, width, channels)))
    tx = (optax.adamw(learning_rate, weight_decay=weight_decay)
          if weight_decay else optax.adam(learning_rate))
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def goal_cross_entropy(params, top_down: jax.Array,
                       goal_cells: jax.Array,
                       sigma: float = 0.0) -> jax.Array:
    """Mean NLL of labeled goal cells under the softmax over map cells.

    With ``sigma > 0`` the one-hot target is replaced by a normalized
    Gaussian heat map around the goal cell — goals are object-sized
    regions, not pixels, and the smoothed target regularizes the
    otherwise sharply-overfitting point NLL (heat-map regression per
    SURVEY.md §7.6's reconstruction of the unshipped trainer).

    Args:
      top_down: ``[B, H, W, C]`` z-collapsed semantic maps.
      goal_cells: ``[B, 2]`` integer (x, y) map coordinates of the goal
        (the format dumped by the search-label pipeline, reference:
        get_search_labels.py:113-132).
    """
    logits = goal_logits(params, top_down)          # [B, H*W]
    h, w = top_down.shape[1], top_down.shape[2]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if sigma <= 0.0:
        flat = goal_cells[:, 1] * w + goal_cells[:, 0]  # y * W + x
        return -jnp.mean(jnp.take_along_axis(logp, flat[:, None],
                                             axis=1))
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy = goal_cells[:, 1].astype(jnp.float32)[:, None]
    gx = goal_cells[:, 0].astype(jnp.float32)[:, None]
    d2 = ((ys[None] - gy) ** 2)[:, :, None] + \
        ((xs[None] - gx) ** 2)[:, None, :]
    target = jnp.exp(-d2 / (2.0 * sigma ** 2)).reshape(len(gy), -1)
    target = target / jnp.sum(target, axis=-1, keepdims=True)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def train_step(state: TrainState, tx: optax.GradientTransformation,
               top_down: jax.Array, goal_cells: jax.Array,
               sigma: float = 0.0) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(goal_cross_entropy)(
        state.params, top_down, goal_cells, sigma)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


# ---------------------------------------------------------------------
# dataset + fit driver (the trainer the reference never shipped)
# ---------------------------------------------------------------------


def load_dataset(logdir: str):
    """Load every ``task-*.npz`` written by mass_tpu.search.dataset into
    (tops [N, H, W, C] float16, cells [N, 2] int32, task_ids [N]) — one
    sample per (snapshot, labeled goal cell) pair, walkthrough and
    unshuffle phases pooled (the same policy serves both inference call
    sites, reference: agent.py:328-339 / :375-415)."""
    import glob
    import os
    import re

    import numpy as np

    tops, cells, task_ids = [], [], []
    for path in sorted(glob.glob(os.path.join(logdir, "task-*.npz"))):
        tid = int(re.search(r"task-(\d+)\.npz", path).group(1))
        with np.load(path) as z:
            for phase in ("0", "1"):
                t, c = z[f"tops{phase}"], z[f"cells{phase}"]
                for i in range(len(t)):
                    for j in range(len(c)):
                        tops.append(t[i])
                        cells.append(c[j])
                        task_ids.append(tid)
    assert tops, f"no task-*.npz files under {logdir}"
    return (np.stack(tops), np.stack(cells).astype(np.int32),
            np.asarray(task_ids))


class _PlainSamples:
    """Sample source for the reference-style single-map policy input."""

    def __init__(self, tops, cells, task_ids):
        self.cells, self.task_ids = cells, task_ids
        self._tops = tops
        self.shape = tops.shape[1:]

    def __len__(self):
        return len(self._tops)

    def top(self, i):
        return self._tops[i]


class _ConditionedSamples:
    """Walkthrough-CONDITIONED samples: the policy input is
    ``concat([current top-down, context], channel)`` where the context
    is the FINISHED walkthrough map for unshuffle-phase samples (the
    map the revisit head reads its sites from, match/revisit.py) and
    zeros for walkthrough-phase samples (no prior map exists at that
    call site).  Snapshots and contexts are stored once and gathered
    per batch — the G x K x 2C cross product never materializes."""

    def __init__(self, snaps, ctxs, snap_idx, ctx_idx, cells, task_ids):
        self.cells, self.task_ids = cells, task_ids
        self._snaps, self._ctxs = snaps, ctxs
        self._si, self._ci = snap_idx, ctx_idx
        h, w, c = snaps.shape[1:]
        self.shape = (h, w, 2 * c)
        self._zero = np.zeros((h, w, c), snaps.dtype)

    def __len__(self):
        return len(self._si)

    def top(self, i):
        ctx = (self._ctxs[self._ci[i]] if self._ci[i] >= 0
               else self._zero)
        return np.concatenate([self._snaps[self._si[i]], ctx], axis=-1)


def load_dataset_conditioned(logdir: str) -> _ConditionedSamples:
    """Conditioned-policy dataset: (snapshot, goal cell) pairs plus a
    per-sample context index — the task's final walkthrough top-down
    (``tops0[-1]``) for unshuffle samples, none for walkthrough samples.

    Unshuffle-phase targets are the union of the misplaced objects'
    WALKTHROUGH cells (``cells0``) and their current cells (``cells1``).
    The walkthrough cells are the learnable part — they are visible in
    the context channel, and visiting them is what makes cross-phase
    disagreement decidable (the measured revisit-head mechanism,
    docs/experiments.md); the current cells are only predictable when
    the current map already shows the object, teaching the
    detector-in-the-loop case.  Training on current cells alone would
    chase the sampler's random respawn spots — the same unpredictable
    target that made the reference's policy class a measured null."""
    import glob
    import os
    import re

    snaps, ctxs = [], []
    snap_idx, ctx_idx, cells, task_ids = [], [], [], []
    for path in sorted(glob.glob(os.path.join(logdir, "task-*.npz"))):
        tid = int(re.search(r"task-(\d+)\.npz", path).group(1))
        with np.load(path) as z:
            t0, c0 = z["tops0"], z["cells0"]
            t1, c1 = z["tops1"], z["cells1"]
        ci = -1
        if len(t0):
            ctxs.append(t0[-1])
            ci = len(ctxs) - 1
        c01 = np.concatenate([c0, c1]) if len(c0) and len(c1) else \
            (c0 if len(c0) else c1)
        for phase_tops, phase_cells, phase_ctx in (
                (t0, c0, -1), (t1, c01, ci)):
            for i in range(len(phase_tops)):
                snaps.append(phase_tops[i])
                si = len(snaps) - 1
                for j in range(len(phase_cells)):
                    snap_idx.append(si)
                    ctx_idx.append(phase_ctx)
                    cells.append(phase_cells[j])
                    task_ids.append(tid)
    assert snap_idx, f"no task-*.npz files under {logdir}"
    return _ConditionedSamples(
        np.stack(snaps), np.stack(ctxs) if ctxs else
        np.zeros((0,) + snaps[0].shape, snaps[0].dtype),
        np.asarray(snap_idx), np.asarray(ctx_idx),
        np.stack(cells).astype(np.int32), np.asarray(task_ids))


def goal_distance(params, top_down, goal_cells) -> "jax.Array":
    """Mean L2 map-cell distance from the policy's argmax cell to the
    labeled goal — the geometric quality the NLL optimizes indirectly."""
    logits = goal_logits(params, top_down)
    w = top_down.shape[2]
    idx = jnp.argmax(logits, axis=-1)
    xy = jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.float32)
    return jnp.mean(jnp.linalg.norm(
        xy - goal_cells.astype(jnp.float32), axis=-1))


def _dihedral_cell(cell, k: int, flip: bool, h: int, w: int):
    """Coordinate leg of the dihedral transform (matches np.rot90)."""
    x, y = int(cell[0]), int(cell[1])
    if flip:
        x = w - 1 - x
    for _ in range(k):
        # np.rot90 CCW: (y, x) -> (w - 1 - x, y); the rotated array is
        # (w, h), so the width used by the next step swaps too
        x, y = y, w - 1 - x
        h, w = w, h
    return np.asarray([x, y], np.int32)


def _dihedral(top: "np.ndarray", cell: "np.ndarray", k: int,
              flip: bool):
    """Apply one of the 8 square symmetries to a (top-down, cell) pair —
    the policy has no preferred compass direction, so the group orbit is
    free training data."""
    h, w = top.shape[:2]
    c = _dihedral_cell(cell, k, flip, h, w)
    if flip:
        top = top[:, ::-1]
    for _ in range(k):
        top = np.rot90(top)
    return top, c


def _device_dihedral(x: jax.Array, k: jax.Array,
                     flip: jax.Array) -> jax.Array:
    """On-device dihedral of a SQUARE ``[H, W, C]`` image — the same
    flip-then-k-CCW-rotations convention as :func:`_dihedral`
    (np.rot90(m) == flip(swapaxes(m, 0, 1), 0))."""
    x = jax.lax.cond(flip, lambda a: jnp.flip(a, 1), lambda a: a, x)
    return jax.lax.switch(k, [
        lambda a: a,
        lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), 0),
        lambda a: jnp.flip(a, (0, 1)),
        lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), 1)], x)


def _assemble_conditioned(snaps, ctxs, si, ci, ks, flips):
    """Gather + concat + augment a conditioned batch ON DEVICE.

    ``snaps``/``ctxs`` are the device-resident fp16 snapshot / context
    pools; per-step host->device traffic is just the index vectors.
    (The naive path ships ~90 MB of batch pixels through the TPU
    tunnel per step and is transfer-bound at ~7 s/step; device-resident
    data + one fused dispatch is ~20x faster end to end.)"""
    x = jnp.take(snaps, si, axis=0)
    ctx = jnp.take(ctxs, jnp.maximum(ci, 0), axis=0)
    ctx = jnp.where((ci >= 0)[:, None, None, None], ctx, 0)
    x = jnp.concatenate([x, ctx], axis=-1).astype(jnp.float32)
    return jax.vmap(_device_dihedral)(x, ks, flips)


def fit(data_dir: str, out_path: str, steps: int = 600,
        batch_size: int = 8, learning_rate: float = 3e-4,
        val_fraction: float = 0.15, seed: int = 0,
        log_every: int = 50, sigma: float = 2.0,
        weight_decay: float = 1e-4, augment: bool = True,
        data_parallel: bool = False, conditioned: bool = False):
    """Train the search policy on collected (top-down, goal-cell) pairs
    and save a flax checkpoint loadable by the agent CLI's
    ``--policy-checkpoint``.

    Splits train/val BY TASK so validation scenes are unseen; targets
    are Gaussian-smoothed heat maps (``sigma`` cells); training batches
    draw random dihedral augmentations; the saved checkpoint is the one
    with the BEST validation smoothed-NLL seen during training.

    ``data_parallel`` shards each batch over a ``(devices,)`` "data"
    mesh with replicated params — jit inserts the gradient psum
    (SURVEY.md §5.8's ICI data-parallel leg; the reference's analogue
    is detectron2's NCCL DDP, train_maskrcnn.py:133-136).  Requires
    ``batch_size`` divisible by the device count.

    ``conditioned`` trains the walkthrough-conditioned variant: the
    input is ``concat([top-down, walkthrough context], channel)`` (2C
    channels; agent/loop.py auto-detects the width at load time) — the
    fix for the measured failure of the reference's policy CLASS,
    which cannot predict occluded object sites from the current map
    alone (docs/experiments.md, multi-room sweeps)."""
    import numpy as np

    from mass_tpu.utils.checkpoint import save_pytree

    source = (load_dataset_conditioned(data_dir) if conditioned
              else _PlainSamples(*load_dataset(data_dir)))
    task_ids = source.task_ids
    cells = source.cells
    uniq = np.unique(task_ids)
    rng = np.random.RandomState(seed)
    rng.shuffle(uniq)
    if len(uniq) < 2:
        raise ValueError(
            f"need >= 2 tasks for a by-task train/val split, got "
            f"{len(uniq)} in {data_dir} — collect more tasks "
            f"(search.dataset --total-tasks)")
    # by-task split, but never let validation claim the training set
    n_val = min(max(1, int(len(uniq) * val_fraction)), len(uniq) - 1)
    val_tasks = set(uniq[:n_val].tolist())
    val_mask = np.isin(task_ids, list(val_tasks))
    tr_idx = np.nonzero(~val_mask)[0]
    va_idx = np.nonzero(val_mask)[0]
    h, w, c = source.shape
    print(f"dataset: {len(tr_idx)} train / {len(va_idx)} val samples "
          f"({len(uniq)} tasks, map {h}x{w}x{c}"
          f"{', conditioned' if conditioned else ''})", flush=True)

    state, tx = create_train_state(jax.random.PRNGKey(seed), h, w, c,
                                   learning_rate, weight_decay)
    # device-resident dataset: upload the fp16 snapshot/context pools
    # once and assemble batches (gather + concat + dihedral) on device —
    # otherwise batch pixels dominate the host->device link (see
    # _assemble_conditioned)
    device_data = conditioned and not data_parallel and h == w
    if device_data:
        snaps_dev = jax.device_put(source._snaps)
        ctxs_np = source._ctxs
        if not len(ctxs_np):
            ctxs_np = np.zeros((1,) + source._snaps.shape[1:],
                               source._snaps.dtype)
        ctxs_dev = jax.device_put(ctxs_np)
        si_all, ci_all = source._si, source._ci
        dd_step = jax.jit(
            lambda s, sn, cx, si, ci, ks, fl, g: train_step(
                s, tx, _assemble_conditioned(sn, cx, si, ci, ks, fl),
                g, sigma))

        def _ident(n):
            return (jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))

        dd_nll = jax.jit(
            lambda p, sn, cx, si, ci, g: goal_cross_entropy(
                p, _assemble_conditioned(sn, cx, si, ci,
                                         *_ident(si.shape[0])),
                g, sigma))
        dd_dist = jax.jit(
            lambda p, sn, cx, si, ci, g: goal_distance(
                p, _assemble_conditioned(sn, cx, si, ci,
                                         *_ident(si.shape[0])), g))
    if data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mass_tpu.parallel import make_mesh

        ndev = jax.device_count()
        assert batch_size % ndev == 0, (
            f"batch_size {batch_size} must divide over {ndev} devices")
        mesh = make_mesh((ndev,), ("data",))
        batch_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)
        step_fn = jax.jit(
            lambda s, t, g: train_step(s, tx, t, g, sigma),
            in_shardings=(rep, batch_sh, batch_sh),
            out_shardings=((rep, rep)))
        print(f"data-parallel over {ndev} devices", flush=True)
    else:
        step_fn = jax.jit(lambda s, t, g: train_step(s, tx, t, g,
                                                     sigma))
    eval_nll = jax.jit(functools.partial(goal_cross_entropy,
                                         sigma=sigma))
    eval_dist = jax.jit(goal_distance)

    def val_metrics(params):
        nll, dist, n = 0.0, 0.0, 0
        for i0 in range(0, len(va_idx), batch_size):
            ids = va_idx[i0:i0 + batch_size]
            g = jnp.asarray(cells[ids])
            k = len(ids)
            if device_data:
                si = jnp.asarray(si_all[ids])
                ci = jnp.asarray(ci_all[ids])
                nll += float(dd_nll(params, snaps_dev, ctxs_dev,
                                    si, ci, g)) * k
                dist += float(dd_dist(params, snaps_dev, ctxs_dev,
                                      si, ci, g)) * k
            else:
                t = jnp.asarray(np.stack([source.top(i) for i in ids]),
                                jnp.float32)
                nll += float(eval_nll(params, t, g)) * k
                dist += float(eval_dist(params, t, g)) * k
            n += k
        return nll / n, dist / n

    best = (float("inf"), None)
    for step in range(steps):
        idx = tr_idx[rng.randint(0, len(tr_idx), batch_size)]
        if device_data:
            if augment:
                ks = rng.randint(0, 4, batch_size)
                fl = rng.randint(0, 2, batch_size).astype(bool)
            else:
                ks = np.zeros(batch_size, np.int64)
                fl = np.zeros(batch_size, bool)
            gs = np.stack([
                _dihedral_cell(cells[i], int(ks[j]), bool(fl[j]), h, w)
                for j, i in enumerate(idx)])
            state, loss = dd_step(
                state, snaps_dev, ctxs_dev,
                jnp.asarray(si_all[idx]), jnp.asarray(ci_all[idx]),
                jnp.asarray(ks, jnp.int32), jnp.asarray(fl),
                jnp.asarray(gs))
        else:
            ts, gs = [], []
            for i in idx:
                t, g = source.top(i), cells[i]
                if augment:
                    t, g = _dihedral(t, g, int(rng.randint(4)),
                                     bool(rng.randint(2)))
                ts.append(np.ascontiguousarray(t))
                gs.append(g)
            state, loss = step_fn(state, jnp.asarray(np.stack(ts),
                                                     jnp.float32),
                                  jnp.asarray(np.stack(gs)))
        if (step + 1) % log_every == 0 or step == 0:
            vn, vd = val_metrics(state.params)
            if vn < best[0]:
                best = (vn, jax.tree_util.tree_map(np.asarray,
                                                   state.params))
            print(f"step {step + 1}/{steps}: train NLL "
                  f"{float(loss):.3f}  val NLL {vn:.3f}  "
                  f"val argmax-dist {vd:.1f} cells", flush=True)

    vn, vd = val_metrics(state.params)
    if vn < best[0]:
        best = (vn, jax.tree_util.tree_map(np.asarray, state.params))
    if best[1] is None:
        raise RuntimeError(
            f"training diverged: validation NLL was never finite "
            f"(final {vn}); lower --learning-rate — no checkpoint "
            f"saved")
    params = best[1]
    vn, vd = val_metrics(params)
    # chance references: uniform NLL = log(H*W); random-cell expected
    # distance ~ 0.52 * map size for uniform draws on a square
    print(f"best: val NLL {vn:.3f} (uniform {np.log(h * w):.3f})  "
          f"val argmax-dist {vd:.1f} cells", flush=True)
    if conditioned:
        # a conditioned head is multi-modal (one input, several labeled
        # site cells), so argmax-to-a-RANDOM-label distance above
        # undersells it; the honest skill measure is argmax to the
        # NEAREST of the input's label set
        groups = {}
        for i in va_idx:
            groups.setdefault(int(source._si[i]), []).append(i)
        lg_fn = jax.jit(goal_logits)
        near = []
        for si, idxs in sorted(groups.items()):
            t = jnp.asarray(source.top(idxs[0])[None], jnp.float32)
            lg = np.asarray(lg_fn(params, t))[0]
            am = int(lg.argmax())
            labels = cells[np.asarray(idxs)]
            near.append(float(np.min(np.hypot(labels[:, 0] - am % w,
                                              labels[:, 1] - am // w))))
        near = np.asarray(near)
        print(f"conditioned val: argmax-to-NEAREST-label mean "
              f"{near.mean():.1f} / median {np.median(near):.1f} cells "
              f"over {len(near)} held-out inputs", flush=True)
    save_pytree(out_path, params)
    print(f"saved policy checkpoint to {out_path}", flush=True)
    return vn, vd


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("semantic-search policy trainer")
    p.add_argument("--data", type=str, required=True,
                   help="dir of task-*.npz from mass_tpu.search.dataset")
    p.add_argument("--out", type=str, required=True,
                   help="checkpoint output path (orbax dir)")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--val-fraction", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sigma", type=float, default=2.0,
                   help="goal heat-map smoothing, in map cells")
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices (params "
                        "replicated, grads psum'd by jit)")
    p.add_argument("--conditioned", action="store_true",
                   help="walkthrough-conditioned input (2x channels: "
                        "current map + finished walkthrough map); the "
                        "agent auto-detects such checkpoints")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    fit(args.data, args.out, steps=args.steps,
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        val_fraction=args.val_fraction, seed=args.seed,
        sigma=args.sigma, weight_decay=args.weight_decay,
        augment=not args.no_augment,
        data_parallel=args.data_parallel,
        conditioned=args.conditioned)


if __name__ == "__main__":
    main()
