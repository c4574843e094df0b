"""Semantic-search goal policy.

A small fully-convolutional network over the top-down collapsed semantic
map that scores every map cell as a candidate exploration goal; goals are
drawn from the softmax over cells (reference: agent.py:744-766 for the
architecture — five 3x3 convs with single-group GroupNorm + ReLU — and
agent.py:328-339 for the softmax/multinomial goal head).

TPU-first differences: NHWC layout (native for XLA convs), a batch axis
everywhere (the reference hardcodes batch 1), and pure-functional
sampling with explicit PRNG keys.  Weights can be imported from the
reference's ``policy.pth`` torch checkpoint for exact behavioral parity.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

NUM_CLASSES = 54  # OccupiedSpace + 43 pickable + 10 openable


class SearchPolicy(nn.Module):
    """Five-conv heat-map network: [B, H, W, C] -> [B, H, W, 1] logits."""

    hidden: int = 64
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.num_layers):
            x = nn.Conv(self.hidden, (3, 3), padding="SAME")(x)
            # single-group GroupNorm == per-sample layer norm over C,H,W
            # (torch GroupNorm eps)
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
            x = nn.relu(x)
        return nn.Conv(1, (3, 3), padding="SAME")(x)


def goal_logits(params, top_down: jax.Array) -> jax.Array:
    """Flat per-cell goal logits ``[B, H*W]`` from a top-down map
    ``[B, H, W, C]`` (z-collapsed by max, reference: agent.py:330-331)."""
    out = SearchPolicy().apply(params, top_down)
    b, h, w, _ = out.shape
    return out.reshape(b, h * w)


def sample_goal_cell(params, top_down: jax.Array,
                     rng: jax.Array) -> jax.Array:
    """Sample a goal cell per batch element from the softmax over cells.

    Returns ``[B, 3]`` map coordinates (x, y, z=0), matching the
    reference's index decoding (agent.py:335-338).
    """
    logits = goal_logits(params, top_down)
    idx = jax.random.categorical(rng, logits, axis=-1)
    w = top_down.shape[2]
    h = top_down.shape[1]
    x = idx % w
    y = (idx // w) % h
    return jnp.stack([x, y, jnp.zeros_like(idx)], axis=-1)


def inhibited_sample_cell(logits, height: int, width: int,
                          prior_cells, radius: float, rng_key):
    """Without-replacement policy decoding (host-side numpy): zero out
    the softmax within ``radius`` map cells of ``prior_cells`` (this
    phase's earlier policy goals), then inverse-CDF sample — an i.i.d.
    draw re-picks the strongest heat-map mode and wastes budget slots
    on one site (the mechanism behind the revisit head's win over the
    plain conditioned head, docs/experiments.md).  Shared by the
    sequential (agent/loop.py) and fleet (parallel/evaluator.py)
    drivers so their decode math cannot drift.

    Returns ``[x, y, 0]`` map-cell coordinates (int64).
    """
    import numpy as np

    logits = np.asarray(logits, np.float64)
    p = np.exp(logits - logits.max())
    if prior_cells:
        xs = np.arange(width)[None, :]
        ys = np.arange(height)[:, None]
        r2 = radius ** 2
        keep = np.ones((height, width), bool)
        for c in prior_cells:
            keep &= ((xs - c[0]) ** 2 + (ys - c[1]) ** 2) > r2
        masked = p * keep.ravel()
        if masked.sum() > 0:        # never mask away ALL mass
            p = masked
    p /= p.sum()
    u = float(jax.random.uniform(rng_key))
    idx = int(np.searchsorted(np.cumsum(p), u))
    idx = min(idx, height * width - 1)
    return np.asarray([idx % width, idx // width, 0], np.int64)


def init_params(rng: jax.Array, height: int = 384, width: int = 384,
                channels: int = NUM_CLASSES):
    return SearchPolicy().init(
        rng, jnp.zeros((1, height, width, channels)))


def input_channels(params) -> int:
    """Input-channel width the checkpoint was trained with.  The network
    is fully convolutional, so the first conv kernel ([3, 3, C_in, h])
    is the only place the input width is baked in; callers use this to
    detect walkthrough-CONDITIONED checkpoints (C_in = 2 x NUM_CLASSES,
    trained by ``search.train --conditioned``) vs plain ones
    (C_in = NUM_CLASSES, the reference's input — agent.py:330-331)."""
    return int(params["params"]["Conv_0"]["kernel"].shape[2])


# ---------------------------------------------------------------------
# reference-checkpoint import
# ---------------------------------------------------------------------

def params_from_torch_state_dict(state_dict: Dict[str, Any]):
    """Convert the reference ``policy.pth`` state dict (a torch
    ``nn.Sequential`` of Conv2d/GroupNorm/ReLU, reference:
    agent.py:744-768) into flax params for :class:`SearchPolicy`.

    Sequential indices: convs at 0,3,6,9 then final conv 12; group norms
    at 1,4,7,10.  Torch conv kernels are OIHW; flax expects HWIO.
    """
    import numpy as np

    def conv(i):
        w = np.asarray(state_dict[f"{i}.weight"])
        b = np.asarray(state_dict[f"{i}.bias"])
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b)}

    def gn(i):
        return {"scale": jnp.asarray(np.asarray(state_dict[f"{i}.weight"])),
                "bias": jnp.asarray(np.asarray(state_dict[f"{i}.bias"]))}

    params = {}
    conv_ids = [0, 3, 6, 9, 12]
    gn_ids = [1, 4, 7, 10]
    for k, i in enumerate(conv_ids):
        params[f"Conv_{k}"] = conv(i)
    for k, i in enumerate(gn_ids):
        params[f"GroupNorm_{k}"] = gn(i)
    return {"params": params}


def load_reference_policy(path: str):
    """Load ``policy.pth`` via torch (host-side, CPU) into flax params."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(state)
