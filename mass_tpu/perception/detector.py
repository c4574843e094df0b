"""Trainable semantic-segmentation detector (the learned perception leg).

The reference's learned perception is a Detectron2 Mask R-CNN whose
instance masks are fused into a per-pixel class image (reference:
mass/thor/segmentation_config.py:311-337, trained by train_maskrcnn.py).
The framework's pipeline only ever consumes that per-pixel class image,
so the TPU-native detector is a compact encoder-decoder network trained
directly on per-pixel classes — jitted end to end, data-parallel over a
device mesh (see train_detector.py).  The instance-level building
blocks (NMS, ROIAlign, mask fusion) live in ops/detection.py and
perception/segmentation.py for full Mask R-CNN composition.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mass_tpu import taxonomy


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class SegmenterUNet(nn.Module):
    """Small UNet: RGB [B, H, W, 3] -> class logits [B, H, W, C]."""

    num_classes: int = taxonomy.NUM_CLASSES
    widths: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        skips = []
        for w in self.widths[:-1]:
            x = ConvBlock(w)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.widths[-1])(x)
        for w, skip in zip(reversed(self.widths[:-1]),
                           reversed(skips)):
            b, h, ww, c = x.shape
            x = jax.image.resize(x, (b, h * 2, ww * 2, c), "nearest")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(w)(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


def init_segmenter(rng, image_size: int = 224,
                   num_classes: int = taxonomy.NUM_CLASSES):
    model = SegmenterUNet(num_classes=num_classes)
    params = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return model, params


def make_segmentation_sensor(params,
                             num_classes: int = taxonomy.NUM_CLASSES):
    """RGB observation -> per-pixel class image, jitted (plugs into the
    semantic map as the learned alternative to GT segmentation)."""
    model = SegmenterUNet(num_classes=num_classes)

    @jax.jit
    def predict(rgb):
        logits = model.apply(params, rgb[None])[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[..., None]

    def sensor(observation):
        import numpy as np
        return np.asarray(predict(jnp.asarray(observation["rgb"],
                                              jnp.float32)))

    return sensor


def instances_from_logits(logits: jax.Array, max_instances: int = 32,
                          score_threshold: float = 0.0,
                          iou_threshold: float = 0.9):
    """Instance detections from per-pixel class logits: connected
    regions of the argmax segmentation become instances with mean-prob
    scores and tight boxes, deduplicated by NMS — composing the
    framework's detection blocks into the Detections contract that the
    mask-fusion sensor consumes (the reference gets this structure from
    Mask R-CNN)."""
    from mass_tpu.ops.components import extract_instances
    from mass_tpu.ops.detection import nms
    from mass_tpu.perception.segmentation import Detections

    probs = jax.nn.softmax(logits, axis=-1)
    classes = jnp.argmax(logits, axis=-1)
    foreground = classes > 0
    inst = extract_instances(foreground, max_instances)

    masks = inst.masks.astype(jnp.float32)           # [K, H, W]
    denom = jnp.maximum(masks.sum((1, 2)), 1.0)
    # majority class per instance
    counts = jnp.einsum("khw,hwc->kc", masks,
                        jax.nn.one_hot(classes, logits.shape[-1]))
    inst_cls = jnp.argmax(counts[:, 1:], axis=-1) + 1
    conf = jnp.take_along_axis(
        jnp.einsum("khw,hwc->kc", masks, probs),
        inst_cls[:, None], axis=1)[:, 0] / denom
    scores = jnp.where(inst.present & (conf >= score_threshold),
                       conf, -jnp.inf)

    x, y, w, h = (inst.boxes[:, 0], inst.boxes[:, 1],
                  inst.boxes[:, 2], inst.boxes[:, 3])
    boxes = jnp.stack([x, y, x + w, y + h], axis=-1).astype(jnp.float32)
    keep = nms(boxes, scores, iou_threshold, max_instances)
    keep_mask = jnp.zeros((max_instances,), jnp.bool_).at[
        jnp.where(keep >= 0, keep, max_instances)].set(
            True, mode="drop")
    scores = jnp.where(keep_mask & jnp.isfinite(scores), scores, 0.0)
    return Detections(masks=masks, classes=inst_cls.astype(jnp.int32),
                      scores=scores)
