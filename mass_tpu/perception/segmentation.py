"""Semantic segmentation sources: GT color lookup and detector fusion.

Two ways to produce the per-pixel class image consumed by the semantic
map (reference: mass/thor/segmentation_config.py:273-337):

  * ground truth — THOR renders a colorized segmentation frame; classes
    are recovered by exact color matching against the taxonomy table,
    with unknown colors mapped to OccupiedSpace (reference :293-307);
  * learned — an instance detector's masks are accumulated per class
    over a confidence threshold and argmaxed per pixel (reference
    :311-337).

Both are fixed-shape jitted device functions; the detector itself is
pluggable behind :class:`SegmentationModel`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu import taxonomy


@functools.partial(jax.jit, static_argnames=())
def colors_to_classes(seg_frame: jax.Array) -> jax.Array:
    """``[h, w, 3]`` uint8 color frame -> ``[h, w, 1]`` int32 class ids.

    Exact-match against the class color table (class 0 excluded from
    matching and used as the fallback, via the reference's 0.1-pad
    argmax trick — reference: segmentation_config.py:293-307).
    """
    colors = jnp.asarray(
        taxonomy.class_colors_array(normalized=False), jnp.int16)
    frame = seg_frame.astype(jnp.int16)
    # [h, w, C-1] exact color match
    match = jnp.all(frame[:, :, None, :] == colors[None, None, 1:],
                    axis=-1)
    padded = jnp.concatenate(
        [jnp.full(match.shape[:2] + (1,), 0.1),
         match.astype(jnp.float32)], axis=-1)
    return jnp.argmax(padded, axis=-1).astype(jnp.int32)[..., None]


class Detections(NamedTuple):
    """Fixed-capacity instance detections for one frame."""

    masks: jax.Array    # [K, h, w] float (0-1 or logits > 0)
    classes: jax.Array  # [K] int32
    scores: jax.Array   # [K] float


@functools.partial(jax.jit, static_argnames=("num_classes",))
def detections_to_semantic(detections: Detections,
                           detection_threshold: float,
                           num_classes: int = taxonomy.NUM_CLASSES,
                           ) -> jax.Array:
    """Fuse instance masks into a per-pixel class image: accumulate
    confident instances' masks per class, argmax per pixel, background
    class 0 where nothing fired (reference:
    segmentation_config.py:311-337)."""
    keep = detections.scores >= detection_threshold
    weights = jnp.where(keep, 1.0, 0.0)
    onehot = jax.nn.one_hot(detections.classes, num_classes)  # [K, C]
    acc = jnp.einsum("khw,kc->hwc",
                     detections.masks * weights[:, None, None], onehot)
    return jnp.argmax(acc, axis=-1).astype(jnp.int32)[..., None]


def detections_to_semantic_tta(detection_sets,
                               detection_threshold: float,
                               num_classes: int = taxonomy.NUM_CLASSES,
                               ) -> jax.Array:
    """Test-time-augmented mask fusion: pool the confident instances of
    SEVERAL detection passes (e.g. original + un-flipped horizontal
    flip) into one mask accumulator before the per-pixel argmax — the
    fused-semantic analog of detectron2's TTA eval hook the reference
    enables with --eval-tta (reference: train_maskrcnn.py:111-113).

    Callers must pre-transform each pass's masks back into the original
    frame (flip the flipped pass's masks along x)."""
    acc = 0.0
    for det in detection_sets:
        keep = det.scores >= detection_threshold
        weights = jnp.where(keep, 1.0, 0.0)
        onehot = jax.nn.one_hot(det.classes, num_classes)
        acc = acc + jnp.einsum(
            "khw,kc->hwc", det.masks * weights[:, None, None], onehot)
    return jnp.argmax(acc, axis=-1).astype(jnp.int32)[..., None]


class SegmentationModel(Protocol):
    """A pluggable detector: RGB frame -> Detections."""

    def __call__(self, rgb: jax.Array) -> Detections:
        ...


class GroundTruthSegmentation:
    """Sensor adapter: consumes the simulator's GT frames.

    For the grid world (which emits class ids directly) this is a
    pass-through; for THOR it color-matches the rendered segmentation
    frame.
    """

    def __call__(self, observation) -> np.ndarray:
        if "semantic" in observation:
            return np.asarray(observation["semantic"])
        return np.asarray(colors_to_classes(
            jnp.asarray(observation["semantic_colors"])))


class DetectorSegmentation:
    """Sensor adapter running a jitted detector + mask fusion."""

    def __init__(self, model: SegmentationModel,
                 detection_threshold: float = 0.9):
        self.model = model
        self.detection_threshold = detection_threshold

    def __call__(self, observation) -> np.ndarray:
        det = self.model(jnp.asarray(observation["rgb"]))
        return np.asarray(detections_to_semantic(
            det, self.detection_threshold))


def make_batched_sensor(sensor):
    """Lift a per-frame segmentation sensor to a frame batch
    (``[B, h, w, 3]`` rgb -> ``[B, h, w, 1]`` int32 classes).

    For :class:`DetectorSegmentation` the whole batch runs as ONE
    jitted vmapped forward — the fleet evaluator's dispatch-bound
    serving shape (B episodes' detector inference per tick collapses
    to a single device launch).  Any other sensor falls back to a
    per-frame loop with identical semantics.
    """
    if isinstance(sensor, DetectorSegmentation):
        model = sensor.model
        threshold = sensor.detection_threshold

        @jax.jit
        def forward(rgb_batch):
            return jax.vmap(lambda rgb: detections_to_semantic(
                model(rgb), threshold))(rgb_batch)

        def batched(rgb_batch) -> np.ndarray:
            return np.asarray(forward(jnp.asarray(rgb_batch)))

        return batched

    def looped(rgb_batch) -> np.ndarray:
        return np.stack([np.asarray(sensor({"rgb": rgb}))
                         for rgb in np.asarray(rgb_batch)])

    return looped


class SegmentationTaskWrapper:
    """Task decorator replacing GT ``semantic`` with a learned sensor.

    The reference flips the same switch inside its semantic sensor
    (ground_truth vs Mask R-CNN forward — reference:
    segmentation_config.py:207-218, 273-337); here the simulator stays
    untouched and the swap happens at the task seam.  The GT image is
    stashed under ``gt_semantic`` for diagnostics."""

    def __init__(self, task, sensor):
        self._task = task
        self._sensor = sensor

    def get_observations(self):
        obs = dict(self._task.get_observations())
        if "semantic" in obs:
            obs["gt_semantic"] = obs["semantic"]
        obs["semantic"] = self._sensor(obs)
        return obs

    def __getattr__(self, name):
        return getattr(self._task, name)


class SegmentationSampler:
    """Task-sampler decorator wrapping every task with a learned
    segmentation sensor."""

    def __init__(self, sampler, sensor):
        self._sampler = sampler
        self._sensor = sensor

    def next_task(self):
        return SegmentationTaskWrapper(self._sampler.next_task(),
                                       self._sensor)

    def skip_task(self):
        return self._sampler.skip_task()

    def __getattr__(self, name):
        return getattr(self._sampler, name)
