"""Trilinear voxel scatter-update — the framework's hottest op.

Semantics (matching reference: mass/utils/projection.py:233-351): each
valid point contributes to the 8 voxels around it with trilinear weights
``w`` derived from its fractional position; a touched voxel's features
become the w-weighted average of per-point EMA blends with the old value:

    final_v = sum_p (w_p / W_v) * [(1 - iw*w_p) * old_v + iw*w_p * f_p]
    where W_v = sum_p w_p over points touching v this update.

The reference realizes this with gather -> in-place zero -> scatter_add
over dynamically compacted points.  Algebraically the same update is

    W_v  = sum w_p        S2_v = sum w_p^2       T_v = sum w_p^2 f_p
    final_v = old_v * (1 - iw * S2_v / W_v) + iw * T_v / W_v

Measured v5e realities that shaped this implementation (see
docs/performance.md):
  * XLA scatter serializes (~30 ns/element); only 1-D scalar
    scatter-add is usable.  Row/column/2-D-element scatters are 5-50x
    worse and are avoided entirely on the hot path.
  * Any array whose minor dim < 128 is lane-padded (a [V, 54] map
    would occupy 2.4x its size; [V, 1] — 128x!), so one-hot maps are
    stored CHANNEL-MAJOR FLAT: ``data[c * V + v]``, one contiguous [V]
    run per feature channel, zero padding.
  * The per-voxel multiplier pass runs as F fused [V]-slice passes
    (dynamic_slice/update_slice on the flat buffer — layout-change
    free), not as a broadcast (whose reshape forces a 3 GB relayout).
  * For one-hot features each pixel touches ONE channel, so the
    additive term is a single 1-D scalar scatter at ``c * V + v``.

Dense-feature maps (conv-backbone embeddings, F a multiple of 128) are
stored voxel-major ``[V, F]`` — lane-aligned, so the multiplier
broadcast fuses and the (few, low-res) additive rows scatter acceptably.

Invalid pixels are routed to an out-of-bounds id and dropped by the
scatters, keeping every shape static.  Everything vmaps (episode
batches) and shards (slab-local ids, parallel/sharding.py).
"""

from __future__ import annotations

from typing import Tuple

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


def corner_contributions(points: BinnedPoints, sizes: Tuple[int, int, int],
                         ) -> Tuple[jax.Array, jax.Array]:
    """Expand binned pixels into their 8 voxel-corner contributions.

    Returns ``(ids, weights)``, both ``[8N]`` in corner-major order (the
    pixel for row ``k`` is ``k % N``).  ``ids`` are flat voxel ids
    ``(row * W + col) * D + z``; invalid pixels get id ``H*W*D`` (one
    past the end — the discard slot).
    """
    size_h, size_w, size_d = sizes
    num_voxels = size_h * size_w * size_d

    ind0 = points.ind_y.reshape(-1)
    ind1 = points.ind_x.reshape(-1)
    ind2 = points.ind_z.reshape(-1)
    valid = points.valid.reshape(-1)

    (l0, u0), (wl0, wu0) = _corner_indices_and_weights(
        ind0, points.ratio_y.reshape(-1), size_h)
    (l1, u1), (wl1, wu1) = _corner_indices_and_weights(
        ind1, points.ratio_x.reshape(-1), size_w)
    (l2, u2), (wl2, wu2) = _corner_indices_and_weights(
        ind2, points.ratio_z.reshape(-1), size_d)

    ids, weights = [], []
    for i0, w0 in ((l0, wl0), (u0, wu0)):
        for i1, w1 in ((l1, wl1), (u1, wu1)):
            for i2, w2 in ((l2, wl2), (u2, wu2)):
                ids.append((i0 * size_w + i1) * size_d + i2)
                weights.append(1e-9 + w0 * w1 * w2)
    ids = jnp.stack(ids).reshape(-1)
    weights = jnp.stack(weights).reshape(-1)
    ids = jnp.where(jnp.tile(valid, 8), ids, num_voxels)
    return ids, weights


def _blend_fields(ids, weights, num_voxels: int, iw: float):
    """Per-voxel multiplier field and per-corner additive scale.

    Returns ``(mult [V], scale [8N])`` with
    ``mult_v = 1 - iw * S2_v / W_v`` (1 where untouched) and
    ``scale_p = iw * w_p^2 / W_{v_p}``.
    """
    w_sum = jnp.zeros(num_voxels + 1, weights.dtype).at[ids].add(weights)
    s2_sum = jnp.zeros(num_voxels + 1, weights.dtype).at[ids].add(
        weights * weights)
    safe_w = jnp.maximum(w_sum, 1e-30)
    mult = jnp.where(w_sum > 0, 1.0 - iw * s2_sum / safe_w, 1.0)
    scale = iw * weights * weights / safe_w[ids]
    return mult[:num_voxels], scale


def apply_onehot_cmajor(data: jax.Array, ids: jax.Array,
                        weights: jax.Array, classes: jax.Array,
                        interpolation_weight: float) -> jax.Array:
    """Apply corner contributions to a channel-major ``[F, V]`` map
    (XLA path; on TPU the Pallas splat kernel in ops/pallas_splat.py is
    preferred — XLA's element scatter serializes there).

    Args:
      data: ``[F, V]`` map.
      ids / weights: ``[8N]`` corner voxel ids and weights.
      classes: ``[N]`` integer feature channel per pixel.
    """
    num_features, num_voxels = data.shape
    mult, scale = _blend_fields(ids, weights, num_voxels,
                                interpolation_weight)
    data = data * mult[None, :]
    cf = jnp.tile(classes, 8)
    oob = jnp.int32(num_voxels)
    safe_ids = jnp.where(ids < num_voxels, ids, oob)
    return data.at[cf, safe_ids].add(scale.astype(data.dtype),
                                     mode="drop")


def apply_onehot_vmajor(data: jax.Array, ids: jax.Array,
                        weights: jax.Array, classes: jax.Array,
                        interpolation_weight: float) -> jax.Array:
    """Apply one-hot corner contributions to a voxel-major ``[V, F]``
    map, touching ONLY contributed rows.

    The cmajor variant pays a full-map multiplier pass per frame — the
    right call on TPU, where the [F, V] layout keeps lanes dense and the
    Pallas kernel fuses the pass, but ruinous on host backends: at the
    reference's production geometry (384x384x96x54) that pass streams
    ~6 GB/frame while only ~4e5 of 7.7e8 elements change.  Here the
    multiplier lands sparsely instead: gather the touched rows, scale by
    the per-voxel EMA multiplier, scatter-*set* them back (duplicate
    corner ids all compute the identical product of OLD row x multiplier,
    so the set is deterministic and needs no dedup/sort), then add the
    per-record one-hot term with a flat scalar scatter (or a 2-D
    element scatter when ``V*F >= 2**31`` — flat int32 addresses would
    overflow on very large host fleet slabs).  Algebra is exactly
    :func:`apply_onehot_cmajor` (reference semantics:
    mass/utils/projection.py:335-351).

    Args:
      data: ``[V, F]`` map (F unpadded — lane padding is a TPU concern).
      ids / weights: ``[8N]`` corner voxel ids and weights (id ``V`` =
        the discard slot for invalid pixels).
      classes: ``[N]`` integer feature channel per pixel.
    """
    num_voxels, num_features = data.shape
    mult, scale = _blend_fields(ids, weights, num_voxels,
                                interpolation_weight)
    valid = ids < num_voxels
    rows = jnp.where(valid, ids, num_voxels)  # OOB row -> dropped
    clamped = jnp.minimum(ids, num_voxels - 1)
    new_rows = data[clamped] * mult[clamped][:, None].astype(data.dtype)
    data = data.at[rows].set(new_rows, mode="drop")
    cf = jnp.tile(classes, 8)
    scale = jnp.where(valid, scale, 0.0).astype(data.dtype)
    if num_voxels * num_features < 2**31:
        # flat 1-D scalar scatter (the fast path on every backend)
        addr = jnp.where(valid, rows * num_features + cf,
                         num_voxels * num_features)
        flat = data.reshape(-1).at[addr].add(scale, mode="drop")
        return flat.reshape(num_voxels, num_features)
    # flat addresses would overflow int32 (e.g. a large fleet slab
    # B*V*F >= 2^31): fall back to the 2-D element scatter — fine on
    # host backends, where this path runs
    return data.at[rows, cf].add(scale, mode="drop")


def _segmented_sum_scan(values: jax.Array, heads: jax.Array) -> jax.Array:
    """Inclusive segmented prefix sum: resets at each head.  ``values``
    may have trailing dims; ``heads`` is [N] bool."""
    flags = heads.astype(values.dtype)
    if values.ndim > 1:
        flags = flags.reshape((-1,) + (1,) * (values.ndim - 1))

    def combine(left, right):
        lv, lf = left
        rv, rf = right
        return rv + (1.0 - rf) * lv, jnp.maximum(lf, rf)

    out, _ = jax.lax.associative_scan(combine, (values, flags))
    return out


def _broadcast_from_ends(values_at_ends: jax.Array,
                         is_end: jax.Array) -> jax.Array:
    """Copy each segment-end value backward over its whole segment."""
    flags = is_end.astype(values_at_ends.dtype)
    if values_at_ends.ndim > 1:
        flags = flags.reshape(
            (-1,) + (1,) * (values_at_ends.ndim - 1))

    def combine(left, right):
        lv, lf = left
        rv, rf = right
        return jnp.where(rf > 0, rv, lv), jnp.maximum(lf, rf)

    rv = jnp.flip(values_at_ends, 0)
    rf = jnp.flip(flags, 0)
    out, _ = jax.lax.associative_scan(combine, (rv, rf))
    return jnp.flip(out, 0)


def segment_totals(values: jax.Array, heads: jax.Array) -> jax.Array:
    """Per-element total of its segment (scatter-free: two scans)."""
    incl = _segmented_sum_scan(values, heads)
    is_end = jnp.concatenate(
        [heads[1:], jnp.ones((1,), jnp.bool_)])
    flags = is_end
    at_ends = jnp.where(
        flags.reshape((-1,) + (1,) * (values.ndim - 1))
        if values.ndim > 1 else flags, incl, 0)
    return _broadcast_from_ends(at_ends, is_end)


def span_sorted_records(ids: jax.Array, weights: jax.Array,
                        classes: jax.Array, num_voxels: int,
                        span_slots: int, num_classes: int = None):
    """Sort splat records by voxel id, carrying payloads through the
    sort network (random gathers are as serialized as scatters on TPU —
    multi-operand ``lax.sort`` moves payloads with the keys instead).

    When the caller knows the class-id bound (``num_classes``) and the
    packed key fits in int32, the class rides the KEY's low bits instead
    of being a third sort operand — one fewer array through the
    comparator network.  Discard records (id == V, the reference's
    compacted-away invalid pixels, mass/utils/projection.py:204-208)
    sort past the last span either way; XLA's static shapes forbid
    actually dropping them, so cheapening their ride is the TPU-native
    equivalent of the reference's pre-filter.

    Returns ``(ids_s, w_s, cls_s, starts)`` where ``starts`` are the
    record ranges of each ``span_slots``-sized voxel-id span.  Per-voxel
    reductions happen inside the splat kernel (one-hot matmuls), so no
    segment sums are needed here.
    """
    cls8 = jnp.tile(classes.reshape(-1), 8).astype(jnp.int32)
    bits = (0 if num_classes is None
            else max(1, int(num_classes - 1).bit_length()))
    if num_classes is not None and \
            ((num_voxels + 1) << bits) <= 2**31 - 1:
        key = (ids.astype(jnp.int32) << bits) | cls8
        key_s, w_s = jax.lax.sort((key, weights), num_keys=1)
        ids_s = key_s >> bits
        cls_s = key_s & ((1 << bits) - 1)
    else:
        ids_s, w_s, cls_s = jax.lax.sort((ids, weights, cls8),
                                         num_keys=1)
    n_spans = (num_voxels + span_slots - 1) // span_slots
    bounds = jnp.arange(n_spans + 1, dtype=jnp.int32) * span_slots
    starts = jnp.searchsorted(ids_s, bounds, side="left").astype(
        jnp.int32)
    return ids_s, w_s.astype(jnp.float32), cls_s, starts


def apply_dense_rows(data: jax.Array, ids: jax.Array, weights: jax.Array,
                     pixel_features: jax.Array,
                     interpolation_weight: float) -> jax.Array:
    """Apply corner contributions to a voxel-major ``[V, F]`` map with
    dense per-pixel features ``[N, F]`` (F lane-aligned; N small — the
    feature camera runs at reduced resolution)."""
    num_voxels = data.shape[0]
    mult, scale = _blend_fields(ids, weights, num_voxels,
                                interpolation_weight)
    data = data * mult[:, None]
    contrib = scale[:, None] * jnp.tile(
        pixel_features.astype(data.dtype), (8, 1))
    return data.at[ids].add(contrib, mode="drop")
