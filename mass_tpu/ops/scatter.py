"""Trilinear voxel scatter-update — the framework's hottest op.

Semantics (matching reference: mass/utils/projection.py:233-351): each
valid point contributes to the 8 voxels around it with trilinear weights
``w`` derived from its fractional position; a touched voxel's features
become the w-weighted average of per-point EMA blends with the old value:

    final_v = sum_p (w_p / W_v) * [(1 - iw*w_p) * old_v + iw*w_p * f_p]
    where W_v = sum_p w_p over points touching v this update.

The reference realizes this with gather → in-place zero → scatter_add.
That formulation is hostile to XLA (in-place mutation, dynamic point
counts).  Here the same math is reorganized around three segment sums

    W_v  = sum w_p        S2_v = sum w_p^2       T_v = sum w_p^2 f_p
    final_v = old_v * (1 - iw * S2_v / W_v) + iw * T_v / W_v

computed over points *sorted by voxel id*, so the update is a single
fixed-shape XLA program: sort (8N keys) → segment-reduce → one unique
scatter into the map.  No per-voxel temporaries are materialized (the
naive route would need a [num_voxels, F] accumulator — ~3 GB for the
default semantic map), and voxels not touched this frame are never read
or written.  Invalid pixels are routed to an out-of-bounds id and dropped
by the scatter, which keeps every shape static for the compiler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mass_tpu.core.geometry import BinnedPoints


def _corner_indices_and_weights(ind, ratio, size: int):
    """Lower/upper cell ids and linear weights along one axis for one
    point (reference: mass/utils/projection.py:280-323).

    A point whose fractional position is below the cell midpoint shares
    weight with the previous cell; above, with the next.  Clamping at the
    grid edge folds both corners onto the same cell (their weights then
    both accumulate there).
    """
    near_low = ratio < 0.5
    lower = jnp.where(near_low, jnp.maximum(ind - 1, 0), ind)
    upper = jnp.where(near_low, ind, jnp.minimum(ind + 1, size - 1))
    w_lower = jnp.where(near_low, 0.5 - ratio, 1.5 - ratio)
    w_upper = jnp.where(near_low, ratio + 0.5, ratio - 0.5)
    return (lower, upper), (w_lower, w_upper)


def trilinear_scatter_update(data: jax.Array, points: BinnedPoints,
                             features: jax.Array,
                             interpolation_weight: float) -> jax.Array:
    """Scatter a frame's features into the voxel map.

    Args:
      data: ``[H, W, D, F]`` voxel features (H = map rows = flipped world y).
      points: binned pixel endpoints; ``ind_y`` indexes axis 0, ``ind_x``
        axis 1, ``ind_z`` axis 2 (reference argument order at
        mass/nn/base_projection_layer.py:338-341).
      features: ``[h, w, F]`` per-pixel features, same pixel grid as points.
      interpolation_weight: EMA blend factor ``iw``.

    Returns:
      Updated ``[H, W, D, F]`` map.
    """
    size_h, size_w, size_d, num_features = data.shape
    num_voxels = size_h * size_w * size_d
    iw = interpolation_weight

    ind0 = points.ind_y.reshape(-1)
    ind1 = points.ind_x.reshape(-1)
    ind2 = points.ind_z.reshape(-1)
    valid = points.valid.reshape(-1)
    n = ind0.shape[0]

    (l0, u0), (wl0, wu0) = _corner_indices_and_weights(
        ind0, points.ratio_y.reshape(-1), size_h)
    (l1, u1), (wl1, wu1) = _corner_indices_and_weights(
        ind1, points.ratio_x.reshape(-1), size_w)
    (l2, u2), (wl2, wu2) = _corner_indices_and_weights(
        ind2, points.ratio_z.reshape(-1), size_d)

    # 8 corners per point, corner-major layout [8, N] -> [8N]
    ids, weights = [], []
    for i0, w0 in ((l0, wl0), (u0, wu0)):
        for i1, w1 in ((l1, wl1), (u1, wu1)):
            for i2, w2 in ((l2, wl2), (u2, wu2)):
                ids.append((i0 * size_w + i1) * size_d + i2)
                weights.append(1e-9 + w0 * w1 * w2)
    ids = jnp.stack(ids).reshape(-1)
    weights = jnp.stack(weights).reshape(-1)

    # route invalid pixels (all 8 corners) to a discard id past the map
    ids = jnp.where(jnp.tile(valid, 8), ids, num_voxels)

    feats = features.reshape(n, num_features).astype(data.dtype)

    # sort corner-points by voxel id so each voxel is one contiguous run
    order = jnp.argsort(ids)
    ids_s = ids[order]
    w_s = weights[order].astype(data.dtype)
    f_s = feats[order % n]

    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1

    w_sum = jax.ops.segment_sum(w_s, seg, num_segments=8 * n)
    w2_sum = jax.ops.segment_sum(w_s * w_s, seg, num_segments=8 * n)
    wf_sum = jax.ops.segment_sum(
        (w_s * w_s)[:, None] * f_s, seg, num_segments=8 * n)

    w_v = jnp.maximum(w_sum[seg], 1e-30)
    s2_v = w2_sum[seg]
    t_v = wf_sum[seg]

    data_flat = data.reshape(num_voxels, num_features)
    old = data_flat[jnp.minimum(ids_s, num_voxels - 1)]
    new = (old * (1.0 - iw * s2_v / w_v)[:, None] +
           iw * t_v / w_v[:, None])

    # one writer per voxel: only segment heads store; discard id drops
    head_ids = jnp.where(head, ids_s, num_voxels)
    data_flat = data_flat.at[head_ids].set(new, mode="drop")
    return data_flat.reshape(size_h, size_w, size_d, num_features)
