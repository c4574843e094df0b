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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mass_tpu.search.policy import SearchPolicy, goal_logits


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def create_train_state(rng: jax.Array, height: int, width: int,
                       channels: int, learning_rate: float = 3e-4,
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = SearchPolicy().init(
        rng, jnp.zeros((1, height, width, channels)))
    tx = optax.adam(learning_rate)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def goal_cross_entropy(params, top_down: jax.Array,
                       goal_cells: jax.Array) -> jax.Array:
    """Mean NLL of labeled goal cells under the softmax over map cells.

    Args:
      top_down: ``[B, H, W, C]`` z-collapsed semantic maps.
      goal_cells: ``[B, 2]`` integer (x, y) map coordinates of the goal
        (the format dumped by the search-label pipeline, reference:
        get_search_labels.py:113-132).
    """
    logits = goal_logits(params, top_down)          # [B, H*W]
    w = top_down.shape[2]
    flat = goal_cells[:, 1] * w + goal_cells[:, 0]  # y * W + x
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, flat[:, None], axis=1))


def train_step(state: TrainState, tx: optax.GradientTransformation,
               top_down: jax.Array, goal_cells: jax.Array,
               ) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(goal_cross_entropy)(
        state.params, top_down, goal_cells)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
