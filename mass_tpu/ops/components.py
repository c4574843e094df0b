"""Connected-component labelling and per-component statistics on device.

The reference finds object instances in the top-down class map with
host-side OpenCV contours + per-ROI reductions (reference:
mass/nn/applications/semantic_projection_layer.py:319-357).  On TPU the
same structure is computed without leaving the device:

  * labels: iterative min-label propagation (8-connectivity, matching
    contour merging of diagonally adjacent blobs) under
    ``lax.while_loop`` — converges in O(longest geodesic) cheap
    vectorized steps;
  * instance extraction: the K most-populous labels (K static), as
    one-hot region masks;
  * per-instance stats: bounding boxes via masked min/max, and ROI
    reductions expressed as masked sums — the reference reduces over
    the instance's *bounding rectangle*, not its component mask, and
    that semantics is preserved here (see ``roi_masks``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mass_tpu.ops.pool import max_pool2d_same


def label_components(mask: jax.Array) -> jax.Array:
    """Label 8-connected components of a boolean ``[H, W]`` mask.

    Returns int32 labels, 0 for background, arbitrary distinct positive
    ids per component (not compacted).
    """
    h, w = mask.shape
    seed = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w +
            jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    labels = jnp.where(mask, seed, jnp.iinfo(jnp.int32).max)

    def propagate(labels):
        neg = -labels  # max-pool of negated = min-pool
        mn = -max_pool2d_same(neg, 1)
        return jnp.where(mask, jnp.minimum(labels, mn), labels)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        # several propagation hops per convergence check: the check is
        # a full-array reduction, the hop a cheap separable max filter
        new = propagate(propagate(propagate(propagate(labels))))
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        cond, body, (propagate(labels), jnp.asarray(True)))
    return jnp.where(mask, labels, 0)


class Instances(NamedTuple):
    """Up to ``K`` extracted components, size-ranked.

    ``present [K]`` marks real instances; ``boxes [K, 4]`` are
    (x, y, w, h) like cv2.boundingRect; ``masks [K, H, W]`` are the
    component masks; ``roi [K, H, W]`` the filled bounding rectangles;
    ``truncated`` (scalar bool) flags that more than ``K`` components
    existed — the reference's cv2-contours path has no cap, so silent
    truncation would be a behavioral divergence worth surfacing.
    """

    present: jax.Array
    boxes: jax.Array
    masks: jax.Array
    roi: jax.Array
    truncated: jax.Array


def extract_instances(mask: jax.Array, max_instances: int) -> Instances:
    """Split a boolean ``[H, W]`` mask into its largest ``max_instances``
    connected components with bounding boxes and ROI masks."""
    h, w = mask.shape
    labels = label_components(mask)

    # the K most-populous distinct labels from ONE sort: run lengths of
    # the sorted labels are (next run start - run start), computed with
    # scans only — no scatter/segment_sum/gather, which serialize on TPU
    # (docs/performance.md)
    flat = labels.reshape(-1)
    n = flat.shape[0]
    lab_sorted = jnp.sort(flat)
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                            lab_sorted[1:] != lab_sorted[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    starts = jnp.where(head, idx, n)
    # suffix-min gives the NEXT run's start for every position
    suffix = jax.lax.cummin(starts, reverse=True)
    next_start = jnp.concatenate(
        [suffix[1:], jnp.asarray([n], jnp.int32)])
    run_len = next_start - idx
    score = jnp.where(head & (lab_sorted > 0), run_len, -1)
    top_counts, top_idx = jax.lax.top_k(score, max_instances)
    present = top_counts > 0
    labs = jnp.where(present, lab_sorted[top_idx], 0)
    truncated = jnp.sum(head & (lab_sorted > 0)) > max_instances

    masks = (labels[None] == labs[:, None, None]) & (labs[:, None, None]
                                                     > 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    big = jnp.int32(1 << 30)
    x0 = jnp.min(jnp.where(masks, xs[None], big), axis=(1, 2))
    y0 = jnp.min(jnp.where(masks, ys[None], big), axis=(1, 2))
    x1 = jnp.max(jnp.where(masks, xs[None], -1), axis=(1, 2))
    y1 = jnp.max(jnp.where(masks, ys[None], -1), axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1], axis=-1)
    boxes = jnp.where(present[:, None], boxes, 0)

    roi = ((xs[None] >= x0[:, None, None]) &
           (xs[None] <= x1[:, None, None]) &
           (ys[None] >= y0[:, None, None]) &
           (ys[None] <= y1[:, None, None]) & present[:, None, None])
    return Instances(present=present, boxes=boxes, masks=masks, roi=roi,
                     truncated=truncated)
