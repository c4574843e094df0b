"""Detection building blocks: IoU, NMS, ROIAlign — in pure JAX.

The reference leans on Detectron2's C++/CUDA custom ops for these
(reference: mass/thor/detectron_utils.py and the detectron2 dependency,
SURVEY.md §2.2).  TPU-native equivalents: NMS as a fixed-iteration
greedy suppression under ``lax.fori_loop`` (detection counts are small
and static), ROIAlign as vectorized bilinear sampling — both jittable
and differentiable where it matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of ``[N, 4]`` and ``[M, 4]`` boxes (x0, y0, x1, y1)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * \
        jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * \
        jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5,
        max_outputs: int = 100) -> jax.Array:
    """Greedy non-maximum suppression.

    Returns ``keep [max_outputs]`` int32 indices into ``boxes`` (-1 pad).
    Fixed shapes: iterates ``max_outputs`` times, each picking the
    highest-scoring unsuppressed box and masking its neighborhood.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, state):
        keep, alive, s = state
        best = jnp.argmax(jnp.where(alive, s, -jnp.inf))
        valid = alive[best]
        keep = keep.at[i].set(jnp.where(valid, best, -1))
        suppress = iou[best] >= iou_threshold
        alive = alive & ~(suppress & valid)
        return keep, alive, s

    keep0 = jnp.full((max_outputs,), -1, jnp.int32)
    alive0 = jnp.ones((n,), jnp.bool_) & (scores > -jnp.inf)
    keep, _, _ = jax.lax.fori_loop(0, min(max_outputs, n), body,
                                   (keep0, alive0, scores))
    return keep


def roi_align(features: jax.Array, boxes: jax.Array, output_size: int,
              sampling_ratio: int = 2) -> jax.Array:
    """ROIAlign: bilinear-sample ``[H, W, C]`` features inside ``[N, 4]``
    boxes (x0, y0, x1, y1 in pixel coords) to ``[N, S, S, C]``.

    Each output cell averages ``sampling_ratio^2`` bilinear samples, the
    detectron2 formulation (aligned=False grid placement).
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    s = output_size
    r = sampling_ratio

    bw = (boxes[:, 2] - boxes[:, 0]) / s   # [N] cell width
    bh = (boxes[:, 3] - boxes[:, 1]) / s

    # sample positions per box/cell/sample: [N, S, r] along each axis
    cell = jnp.arange(s, dtype=jnp.float32)
    sub = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
    gx = (boxes[:, 0, None, None] +
          (cell[None, :, None] + sub[None, None, :]) * bw[:, None, None])
    gy = (boxes[:, 1, None, None] +
          (cell[None, :, None] + sub[None, None, :]) * bh[:, None, None])

    def bilinear(y, x):
        y = jnp.clip(y - 0.5, 0.0, h - 1.0)
        x = jnp.clip(x - 0.5, 0.0, w - 1.0)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fy = (y - y0)[..., None]
        fx = (x - x0)[..., None]
        v00 = features[y0, x0]
        v01 = features[y0, x1]
        v10 = features[y1, x0]
        v11 = features[y1, x1]
        return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01 +
                fy * (1 - fx) * v10 + fy * fx * v11)

    # [N, Sy, ry, Sx, rx, C]
    yy = gy[:, :, :, None, None]
    xx = gx[:, None, None, :, :]
    samples = bilinear(jnp.broadcast_to(yy, (n, s, r, s, r)),
                       jnp.broadcast_to(xx, (n, s, r, s, r)))
    return samples.mean(axis=(2, 4))
