"""Mask R-CNN in flax — the reference's learned-perception leg, TPU-native.

The reference runs a Detectron2 ``mask_rcnn_R_50_FPN_3x`` fine-tuned to
the 54-class THOR taxonomy (reference: mass/thor/detectron_utils.py:6-33)
and fuses its instance masks into the per-pixel class image consumed by
the semantic map (segmentation_config.py:311-337).  This module is a
from-scratch JAX implementation of the same architecture:

  * ResNet-50 (frozen batch norm) + FPN producing P2..P6;
  * RPN head shared across levels, fixed-shape proposal generation
    (per-level top-k -> decode -> clip -> NMS -> global top-k), no
    dynamic shapes anywhere so the whole forward jits once;
  * multilevel ROIAlign (canonical level assignment), two-FC box head,
    class-specific box regression, class-aware NMS via coordinate
    offsetting, fixed detection capacity;
  * mask head (4 convs + deconv) with on-device mask pasting.

Conventions follow detectron2 so the reference's ``model_final.pth``
imports directly (background class LAST in the classifier, BGR pixel
means, aligned ROI sampling); torchvision's ``maskrcnn_resnet50_fpn``
checkpoints import through a row remap.  Detections come out in the
:class:`~mass_tpu.perception.segmentation.Detections` contract and fuse
through ``detections_to_semantic`` exactly like the reference fuses
detectron2 outputs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from mass_tpu.ops.detection import nms, roi_align
from mass_tpu.perception.resnet import Bottleneck
from mass_tpu.perception.segmentation import Detections


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    """Static architecture + inference hyperparameters.

    Defaults mirror detectron2's COCO ``mask_rcnn_R_50_FPN_3x`` config as
    instantiated by the reference (54 classes, square SCREEN_SIZE input
    — reference: mass/thor/detectron_utils.py:10-28)."""

    num_classes: int = 54
    image_size: int = 224
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 500        # per FPN level
    post_nms_topk: int = 256       # proposals entering the box head
    rpn_nms_threshold: float = 0.7
    score_threshold: float = 0.05
    nms_threshold: float = 0.5
    max_detections: int = 64
    candidate_pool: int = 512      # scored (box, class) pairs pre-NMS
    # detectron2 preprocessing: 0-255 BGR, mean-subtract, unit std
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    bgr: bool = True
    pixel_scale: float = 255.0
    # detectron2 Caffe-style R50 strides the 1x1 bottleneck conv
    stride_in_1x1: bool = True

    def torchvision_style(self) -> "MaskRCNNConfig":
        """Preprocessing + stride conventions of torchvision's
        ``maskrcnn_resnet50_fpn`` (0-1 RGB, ImageNet normalization,
        stride on the 3x3 conv)."""
        return dataclasses.replace(
            self, pixel_mean=(0.485, 0.456, 0.406),
            pixel_std=(0.229, 0.224, 0.225), bgr=False,
            pixel_scale=1.0, stride_in_1x1=False)

    @property
    def strides(self) -> Tuple[int, ...]:
        return (4, 8, 16, 32, 64)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_ratios)


# ---------------------------------------------------------------------
# network modules
# ---------------------------------------------------------------------

_STAGE_BLOCKS = (3, 4, 6, 3)
_STAGE_WIDTHS = (64, 128, 256, 512)


class ResNet50(nn.Module):
    """Full ResNet-50 trunk returning stage outputs C2..C5 (frozen BN)."""

    stride_in_1x1: bool = True

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        for stage, (blocks, width) in enumerate(
                zip(_STAGE_BLOCKS, _STAGE_WIDTHS)):
            for b in range(blocks):
                x = Bottleneck(
                    width,
                    stride=2 if (b == 0 and stage > 0) else 1,
                    project=(b == 0),
                    stride_in_1x1=self.stride_in_1x1,
                    name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return outs


class FPN(nn.Module):
    """Lateral 1x1 + top-down sum + 3x3 output convs: C2..C5 -> P2..P6."""

    features: int = 256

    @nn.compact
    def __call__(self, c: List[jax.Array]) -> List[jax.Array]:
        laterals = [
            nn.Conv(self.features, (1, 1), name=f"lateral{i + 2}")(ci)
            for i, ci in enumerate(c)]
        tops = [laterals[-1]]
        for lat in laterals[-2::-1]:
            # resize to the lateral's actual shape (not a fixed 2x):
            # odd stage sizes appear whenever image_size is not a
            # multiple of 32, e.g. a 48px detector (detectron2 also
            # interpolates to the lateral, fpn.py)
            up = jax.image.resize(tops[-1], lat.shape, "nearest")
            tops.append(up + lat)
        tops = tops[::-1]
        outs = [
            nn.Conv(self.features, (3, 3),
                    padding=[(1, 1), (1, 1)], name=f"output{i + 2}")(t)
            for i, t in enumerate(tops)]
        # P6: stride-2 subsample of P5 (torchvision LastLevelMaxPool /
        # detectron2 LastLevelMaxPool: max_pool2d(p5, 1, 2))
        outs.append(outs[-1][:, ::2, ::2])
        return outs


class RPNHead(nn.Module):
    """Shared 3x3 conv + per-anchor objectness and box deltas
    (detectron2 initialization: N(0, 0.01) kernels)."""

    num_anchors: int = 3

    @nn.compact
    def __call__(self, feat):
        init = nn.initializers.normal(0.01)
        t = nn.relu(nn.Conv(feat.shape[-1], (3, 3),
                            padding=[(1, 1), (1, 1)], kernel_init=init,
                            name="conv")(feat))
        obj = nn.Conv(self.num_anchors, (1, 1), kernel_init=init,
                      name="objectness")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                         name="deltas")(t)
        return obj, deltas


class BoxHead(nn.Module):
    """Two-FC head over flattened 7x7x256 ROI features."""

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(1024, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, name="fc7")(x))
        return x


class BoxPredictor(nn.Module):
    """Classifier (background LAST, detectron2 convention) +
    class-specific box deltas."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(self.num_classes + 1,
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)
        return logits, deltas.reshape((x.shape[0], self.num_classes, 4))


class MaskHead(nn.Module):
    """4x conv3x3 + 2x deconv + 1x1 per-class mask logits (28x28)."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                name=f"mask_fcn{i + 1}")(x))
        # exact torch ConvTranspose2d(256, 256, 2, stride=2) semantics:
        # each input pixel expands to a 2x2 block via the kernel
        w = self.param("deconv_kernel", nn.initializers.he_normal(),
                       (256, 256, 2, 2))
        b = self.param("deconv_bias", nn.initializers.zeros, (256,))
        n, h, ww, cin = x.shape
        y = jnp.einsum("nhwc,cdij->nhidwj", x, w,
                       precision=jax.lax.Precision.HIGHEST)
        # [n, h, 2, d, w, 2] -> [n, 2h, d, 2w]: out[2i+di, 2j+dj]
        y = y.reshape(n, h * 2, 256, ww * 2)
        x = nn.relu(jnp.moveaxis(y, 2, -1) + b)
        return nn.Conv(self.num_classes, (1, 1), name="predictor")(x)


class MaskRCNN(nn.Module):
    """Container module exposing the neural stages via ``method=``."""

    config: MaskRCNNConfig

    def setup(self):
        self.backbone = ResNet50(
            stride_in_1x1=self.config.stride_in_1x1)
        self.fpn = FPN()
        self.rpn_head = RPNHead(num_anchors=self.config.num_anchors)
        self.box_head = BoxHead()
        self.box_predictor = BoxPredictor(self.config.num_classes)
        self.mask_head = MaskHead(self.config.num_classes)

    def __call__(self, images):
        # full init path: touch every submodule once
        feats = self.features(images)
        rpn = [self.rpn(f) for f in feats]
        roi7 = jnp.zeros((1, 7, 7, 256))
        roi14 = jnp.zeros((1, 14, 14, 256))
        box = self.box(roi7)
        masks = self.masks(roi14)
        return feats, rpn, box, masks

    def features(self, images) -> List[jax.Array]:
        """Normalized images -> [P2, P3, P4, P5, P6]."""
        c = self.config
        x = images * c.pixel_scale
        if c.bgr:
            x = x[..., ::-1]
        mean = jnp.asarray(c.pixel_mean)
        std = jnp.asarray(c.pixel_std)
        x = (x - mean) / std
        return self.fpn(self.backbone(x))

    def rpn(self, feat):
        return self.rpn_head(feat)

    def box(self, rois):
        return self.box_predictor(self.box_head(rois))

    def masks(self, rois):
        return self.mask_head(rois)


# ---------------------------------------------------------------------
# anchors + box coding
# ---------------------------------------------------------------------

def cell_anchors(size: float, ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered anchors (x0, y0, x1, y1) for one level."""
    out = []
    for r in ratios:
        w = size / math.sqrt(r)
        h = size * math.sqrt(r)
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def level_anchors(config: MaskRCNNConfig) -> List[np.ndarray]:
    """Per-level ``[H*W*A, 4]`` anchor grids for a square image.

    Grid origin at pixel (0, 0) stepping by the level stride (both
    torchvision and detectron2 defaults place anchor centers at
    ``index * stride``)."""
    side = config.image_size
    sizes = [side // s for s in (4, 8, 16, 32)]
    sizes.append((sizes[-1] + 1) // 2)
    out = []
    for size, stride, hw in zip(config.anchor_sizes, config.strides,
                                sizes):
        base = cell_anchors(size, config.anchor_ratios)  # [A, 4]
        xs = np.arange(hw, dtype=np.float32) * stride
        sx, sy = np.meshgrid(xs, xs)                      # [h, w]
        shifts = np.stack([sx, sy, sx, sy], -1)           # [h, w, 4]
        anch = shifts[:, :, None, :] + base[None, None]   # [h, w, A, 4]
        out.append(anch.reshape(-1, 4))
    return out


_DW_CLAMP = math.log(1000.0 / 16)


def decode_boxes(anchors: jax.Array, deltas: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Apply (dx, dy, dw, dh) deltas to xyxy anchors."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    cxa = anchors[..., 0] + wa / 2
    cya = anchors[..., 1] + ha / 2
    dx = deltas[..., 0] / weights[0]
    dy = deltas[..., 1] / weights[1]
    dw = jnp.minimum(deltas[..., 2] / weights[2], _DW_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / weights[3], _DW_CLAMP)
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = wa * jnp.exp(dw)
    h = ha * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def encode_boxes(anchors: jax.Array, boxes: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Inverse of :func:`decode_boxes` (training targets)."""
    wa = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ha = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    cxa = anchors[..., 0] + wa / 2
    cya = anchors[..., 1] + ha / 2
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    cx = boxes[..., 0] + w / 2
    cy = boxes[..., 1] + h / 2
    return jnp.stack([
        weights[0] * (cx - cxa) / wa,
        weights[1] * (cy - cya) / ha,
        weights[2] * jnp.log(w / wa),
        weights[3] * jnp.log(h / ha)], axis=-1)


def clip_boxes(boxes: jax.Array, size: float) -> jax.Array:
    return jnp.clip(boxes, 0.0, size)


# ---------------------------------------------------------------------
# inference pipeline (pure functions over model.apply)
# ---------------------------------------------------------------------

def generate_proposals(config: MaskRCNNConfig,
                       rpn_outputs: List[Tuple[jax.Array, jax.Array]],
                       anchors: List[jax.Array],
                       ) -> Tuple[jax.Array, jax.Array]:
    """Fixed-shape RPN proposals: per-level top-k + NMS, global top-k.

    Per-level NMS then global score top-k is exactly torchvision /
    detectron2's level-offset ``batched_nms`` (no cross-level
    suppression).  Returns ``(boxes [R, 4], scores [R])`` with
    ``R = post_nms_topk`` (-inf scores mark padding)."""
    all_boxes, all_scores = [], []
    for (obj, deltas), anch in zip(rpn_outputs, anchors):
        n = anch.shape[0]
        obj = obj.reshape(-1)
        deltas = deltas.reshape(-1, 4)
        k = min(config.pre_nms_topk, n)
        scores, idx = jax.lax.top_k(obj, k)
        boxes = decode_boxes(anch[idx], deltas[idx])
        boxes = clip_boxes(boxes, config.image_size)
        degenerate = ((boxes[:, 2] - boxes[:, 0] < 1e-3) |
                      (boxes[:, 3] - boxes[:, 1] < 1e-3))
        scores = jnp.where(degenerate, -jnp.inf, scores)
        m = min(k, config.post_nms_topk)
        keep = nms(boxes, scores, config.rpn_nms_threshold, m)
        valid = keep >= 0
        safe = jnp.maximum(keep, 0)
        all_boxes.append(boxes[safe])
        all_scores.append(jnp.where(valid, scores[safe], -jnp.inf))
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    top, idx = jax.lax.top_k(scores, config.post_nms_topk)
    return boxes[idx], top


def assign_levels(boxes: jax.Array) -> jax.Array:
    """Canonical FPN level (0=P2 .. 3=P5) per box."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224 + 1e-8))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2


def multilevel_roi_align(features: List[jax.Array], boxes: jax.Array,
                         output_size: int) -> jax.Array:
    """ROIAlign each box on its assigned FPN level (P2..P5)."""
    lvl = assign_levels(boxes)
    pooled = None
    for i, (feat, stride) in enumerate(zip(features[:4],
                                           (4, 8, 16, 32))):
        p = roi_align(feat, boxes / stride, output_size)
        sel = (lvl == i).astype(p.dtype)[:, None, None, None]
        pooled = p * sel if pooled is None else pooled + p * sel
    return pooled


def paste_masks(masks: jax.Array, boxes: jax.Array, height: int,
                width: int) -> jax.Array:
    """Resample ``[K, M, M]`` box-local masks into ``[K, H, W]`` image
    space (bilinear, zero outside the box) — detectron2's
    paste_masks_in_image without the host roundtrip."""
    k, m, _ = masks.shape
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-3)
    bh = jnp.maximum(y1 - y0, 1e-3)
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5    # pixel centers
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx = (xs[None] - x0[:, None]) / bw[:, None] * m - 0.5   # [K, W]
    gy = (ys[None] - y0[:, None]) / bh[:, None] * m - 0.5   # [K, H]
    inside = ((xs[None] >= x0[:, None]) & (xs[None] <= x1[:, None]))
    inside_y = ((ys[None] >= y0[:, None]) & (ys[None] <= y1[:, None]))

    cgx = jnp.clip(gx, 0.0, m - 1.0)
    cgy = jnp.clip(gy, 0.0, m - 1.0)
    x0i = jnp.floor(cgx).astype(jnp.int32)
    y0i = jnp.floor(cgy).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, m - 1)
    y1i = jnp.minimum(y0i + 1, m - 1)
    fx = cgx - x0i
    fy = cgy - y0i

    def gather(mk, yi, xi):
        # mk [M, M], yi [H], xi [W] -> [H, W]
        return mk[yi][:, xi]

    def per_mask(mk, y0i, y1i, x0i, x1i, fy, fx):
        v00 = gather(mk, y0i, x0i)
        v01 = gather(mk, y0i, x1i)
        v10 = gather(mk, y1i, x0i)
        v11 = gather(mk, y1i, x1i)
        return ((1 - fy[:, None]) * (1 - fx[None]) * v00 +
                (1 - fy[:, None]) * fx[None] * v01 +
                fy[:, None] * (1 - fx[None]) * v10 +
                fy[:, None] * fx[None] * v11)

    out = jax.vmap(per_mask)(masks, y0i, y1i, x0i, x1i, fy, fx)
    return out * inside_y[:, :, None] * inside[:, None, :]


BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def detect(model: MaskRCNN, params, rgb: jax.Array,
           anchors: List[jax.Array]) -> Detections:
    """Full single-image inference: RGB [H, W, 3] in 0-1 -> Detections.

    Mirrors the reference's DefaultPredictor forward consumed at
    segmentation_config.py:311-337; all shapes static."""
    c = model.config
    feats = model.apply(params, rgb[None], method=MaskRCNN.features)
    rpn_out = [model.apply(params, f, method=MaskRCNN.rpn)
               for f in feats]
    rpn_out = [(o[0], d[0]) for o, d in rpn_out]
    proposals, pscores = generate_proposals(c, rpn_out, anchors)

    feats0 = [f[0] for f in feats]
    rois = multilevel_roi_align(feats0, proposals, 7)
    logits, deltas = model.apply(params, rois, method=MaskRCNN.box)
    probs = jax.nn.softmax(logits, axis=-1)[:, :c.num_classes]  # bg last
    # a proposal that was padding (score -inf) must not detect anything
    probs = jnp.where(jnp.isfinite(pscores)[:, None], probs, 0.0)

    boxes_c = decode_boxes(proposals[:, None, :], deltas,
                           BOX_REG_WEIGHTS)            # [R, C, 4]
    boxes_c = clip_boxes(boxes_c, c.image_size)

    flat_scores = probs.reshape(-1)                     # [R*C]
    pool = min(c.candidate_pool, flat_scores.shape[0])
    top, idx = jax.lax.top_k(flat_scores, pool)
    cls = (idx % c.num_classes).astype(jnp.int32)
    cand = boxes_c.reshape(-1, 4)[idx]
    top = jnp.where(top >= c.score_threshold, top, -jnp.inf)
    degenerate = ((cand[:, 2] - cand[:, 0] < 1e-3) |
                  (cand[:, 3] - cand[:, 1] < 1e-3))
    top = jnp.where(degenerate, -jnp.inf, top)
    # class-aware NMS: offset each class into its own coordinate island
    offset = cls.astype(jnp.float32)[:, None] * (c.image_size + 2.0)
    keep = nms(cand + offset, top, c.nms_threshold, c.max_detections)
    valid = keep >= 0
    safe = jnp.maximum(keep, 0)
    det_boxes = cand[safe]
    det_scores = jnp.where(valid, top[safe], -jnp.inf)
    det_cls = cls[safe]
    det_scores = jnp.where(jnp.isfinite(det_scores), det_scores, 0.0)

    mrois = multilevel_roi_align(feats0, det_boxes, 14)
    mask_logits = model.apply(params, mrois, method=MaskRCNN.masks)
    sel = jnp.take_along_axis(
        mask_logits, det_cls[:, None, None, None], axis=-1)[..., 0]
    mask_probs = jax.nn.sigmoid(sel)                    # [K, 28, 28]
    full = paste_masks(mask_probs, det_boxes, c.image_size,
                       c.image_size)
    binary = (full >= 0.5).astype(jnp.float32)
    binary = binary * (det_scores > 0)[:, None, None]
    return Detections(masks=binary, classes=det_cls, scores=det_scores)


def init_maskrcnn(rng, config: MaskRCNNConfig = MaskRCNNConfig()):
    model = MaskRCNN(config)
    params = model.init(
        rng, jnp.zeros((1, config.image_size, config.image_size, 3)))
    return model, params


def make_detector(params, config: MaskRCNNConfig = MaskRCNNConfig(),
                  class_offset: int = 0):
    """Jitted ``rgb -> Detections`` closure satisfying the
    SegmentationModel protocol.  ``class_offset`` maps detector class
    ids into taxonomy ids (0 for reference-style 54-class checkpoints,
    1 for datasets that skip the OccupiedSpace class)."""
    model = MaskRCNN(config)
    anchors = [jnp.asarray(a) for a in level_anchors(config)]

    @jax.jit
    def run(rgb):
        det = detect(model, params, rgb, anchors)
        return det._replace(classes=det.classes + class_offset)

    return run


# ---------------------------------------------------------------------
# torch checkpoint import (no torchvision / detectron2 needed — pure
# key mapping over a loaded state dict)
# ---------------------------------------------------------------------

def _t(x) -> np.ndarray:
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def _conv_kernel(w) -> jnp.ndarray:
    return jnp.asarray(_t(w).transpose(2, 3, 1, 0))


def _dense(sd, key):
    return {"kernel": jnp.asarray(_t(sd[f"{key}.weight"]).T),
            "bias": jnp.asarray(_t(sd[f"{key}.bias"]))}


def _dense_roi(sd, key, size=7, channels=256):
    """First FC over flattened ROI features: torch flattens [C, S, S]
    channel-major, flax flattens [S, S, C] — permute the input axis."""
    w = _t(sd[f"{key}.weight"])                       # [out, C*S*S]
    out = w.shape[0]
    w = w.reshape(out, channels, size, size)
    w = w.transpose(0, 2, 3, 1).reshape(out, -1)      # -> [out, S*S*C]
    return {"kernel": jnp.asarray(w.T),
            "bias": jnp.asarray(_t(sd[f"{key}.bias"]))}


def _conv(sd, key, bias=True):
    p = {"kernel": _conv_kernel(sd[f"{key}.weight"])}
    if bias:
        p["bias"] = jnp.asarray(_t(sd[f"{key}.bias"]))
    return p


def _bn_split(sd, key):
    return ({"scale": jnp.asarray(_t(sd[f"{key}.weight"])),
             "bias": jnp.asarray(_t(sd[f"{key}.bias"]))},
            {"mean": jnp.asarray(_t(sd[f"{key}.running_mean"])),
             "var": jnp.asarray(_t(sd[f"{key}.running_var"]))})


def _backbone_from_torch(sd, conv1, bn1, layer_fmt, bn_suffix):
    """Shared ResNet-50 trunk mapping; ``layer_fmt(stage, block)`` gives
    the torch key prefix, ``bn_suffix(conv_key, i)`` the BN key."""
    params: Dict[str, Any] = {"conv1": {"kernel": _conv_kernel(sd[conv1])}}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn_split(sd, bn1)
    for stage in range(4):
        for b in range(_STAGE_BLOCKS[stage]):
            prefix = layer_fmt(stage, b)
            name = f"layer{stage + 1}_{b}"
            p, s = {}, {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _conv_kernel(
                    sd[f"{prefix}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = _bn_split(
                    sd, bn_suffix(f"{prefix}.conv{i}", i))
            if b == 0:
                down, down_bn = _down_keys(sd, prefix)
                p["down_conv"] = {"kernel": _conv_kernel(sd[down])}
                p["down_bn"], s["down_bn"] = _bn_split(sd, down_bn)
            params[name] = p
            stats[name] = s
    return params, stats


def _down_keys(sd, prefix):
    if f"{prefix}.downsample.0.weight" in sd:       # torchvision
        return (f"{prefix}.downsample.0.weight",
                f"{prefix}.downsample.1")
    return (f"{prefix}.shortcut.weight",            # detectron2
            f"{prefix}.shortcut.norm")


def params_from_detectron2(state_dict: Dict[str, Any],
                           config: MaskRCNNConfig = MaskRCNNConfig()):
    """Map a detectron2 ``mask_rcnn_R_50_FPN`` checkpoint (the
    reference's ``model_final.pth`` format: {"model": {key: array}}) to
    flax variables.  Pass the inner model dict or the full checkpoint."""
    sd = state_dict.get("model", state_dict)
    bb, bb_stats = _backbone_from_torch(
        sd,
        "backbone.bottom_up.stem.conv1.weight",
        "backbone.bottom_up.stem.conv1.norm",
        lambda s, b: f"backbone.bottom_up.res{s + 2}.{b}",
        lambda ck, i: f"{ck}.norm")

    fpn = {}
    for i in range(4):
        fpn[f"lateral{i + 2}"] = _conv(sd, f"backbone.fpn_lateral{i + 2}")
        fpn[f"output{i + 2}"] = _conv(sd, f"backbone.fpn_output{i + 2}")

    rpn = {"conv": _conv(sd, "proposal_generator.rpn_head.conv"),
           "objectness": _conv(
               sd, "proposal_generator.rpn_head.objectness_logits"),
           "deltas": _conv(
               sd, "proposal_generator.rpn_head.anchor_deltas")}

    box_head = {"fc6": _dense_roi(sd, "roi_heads.box_head.fc1"),
                "fc7": _dense(sd, "roi_heads.box_head.fc2")}
    box_pred = {"cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
                "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred")}

    mask = {}
    for i in range(4):
        mask[f"mask_fcn{i + 1}"] = _conv(
            sd, f"roi_heads.mask_head.mask_fcn{i + 1}")
    mask["deconv_kernel"] = jnp.asarray(
        _t(sd["roi_heads.mask_head.deconv.weight"]))  # [in, out, 2, 2]
    mask["deconv_bias"] = jnp.asarray(
        _t(sd["roi_heads.mask_head.deconv.bias"]))
    mask["predictor"] = _conv(sd, "roi_heads.mask_head.predictor")

    return _assemble(bb, bb_stats, fpn, rpn, box_head, box_pred, mask)


def params_from_torchvision_maskrcnn(
        state_dict: Dict[str, Any],
        config: MaskRCNNConfig = MaskRCNNConfig()):
    """Map a torchvision ``maskrcnn_resnet50_fpn`` state dict to flax
    variables, converting torchvision's background-FIRST classifier to
    the internal background-LAST layout and dropping the background box
    regression row."""
    sd = state_dict

    def fpn_key(kind, i):
        # torchvision >= 0.13 nests an extra Conv2dNormActivation
        for k in (f"backbone.fpn.{kind}.{i}.0.weight",
                  f"backbone.fpn.{kind}.{i}.weight"):
            if k in sd:
                return k[:-len(".weight")]
        raise KeyError(f"backbone.fpn.{kind}.{i}")

    bb, bb_stats = _backbone_from_torch(
        sd,
        "backbone.body.conv1.weight",
        "backbone.body.bn1",
        lambda s, b: f"backbone.body.layer{s + 1}.{b}",
        lambda ck, i: ck.replace(f"conv{i}", f"bn{i}"))

    fpn = {}
    for i in range(4):
        fpn[f"lateral{i + 2}"] = _conv(sd, fpn_key("inner_blocks", i))
        fpn[f"output{i + 2}"] = _conv(sd, fpn_key("layer_blocks", i))

    rpn_conv_key = ("rpn.head.conv.0.0" if "rpn.head.conv.0.0.weight"
                    in sd else "rpn.head.conv")
    rpn = {"conv": _conv(sd, rpn_conv_key),
           "objectness": _conv(sd, "rpn.head.cls_logits"),
           "deltas": _conv(sd, "rpn.head.bbox_pred")}

    box_head = {"fc6": _dense_roi(sd, "roi_heads.box_head.fc6"),
                "fc7": _dense(sd, "roi_heads.box_head.fc7")}
    cls = _dense(sd, "roi_heads.box_predictor.cls_score")
    # background row 0 -> last
    box_pred = {"cls_score": {
        "kernel": jnp.concatenate([cls["kernel"][:, 1:],
                                   cls["kernel"][:, :1]], axis=1),
        "bias": jnp.concatenate([cls["bias"][1:], cls["bias"][:1]])}}
    reg = _dense(sd, "roi_heads.box_predictor.bbox_pred")
    box_pred["bbox_pred"] = {"kernel": reg["kernel"][:, 4:],
                             "bias": reg["bias"][4:]}

    mask = {}
    for i in range(4):
        key = f"roi_heads.mask_head.mask_fcn{i + 1}"
        if f"{key}.weight" not in sd:       # torchvision >= 0.13 nesting
            key = f"roi_heads.mask_head.{i}.0"
        mask[f"mask_fcn{i + 1}"] = _conv(sd, key)
    mask["deconv_kernel"] = jnp.asarray(
        _t(sd["roi_heads.mask_predictor.conv5_mask.weight"]))
    mask["deconv_bias"] = jnp.asarray(
        _t(sd["roi_heads.mask_predictor.conv5_mask.bias"]))
    mask["predictor"] = _conv(sd, "roi_heads.mask_predictor.mask_fcn_logits")

    return _assemble(bb, bb_stats, fpn, rpn, box_head, box_pred, mask)


def _assemble(bb, bb_stats, fpn, rpn, box_head, box_pred, mask):
    return {
        "params": {
            "backbone": bb,
            "fpn": fpn,
            "rpn_head": rpn,
            "box_head": box_head,
            "box_predictor": box_pred,
            "mask_head": mask,
        },
        "batch_stats": {"backbone": bb_stats},
    }


def export_detectron2_state_dict(variables,
                                 config: MaskRCNNConfig =
                                 MaskRCNNConfig()) -> Dict[str, Any]:
    """Inverse of :func:`params_from_detectron2`: flax variables -> a
    detectron2-convention state dict (numpy tensors, torch layouts).

    Lets flax-trained detectors deploy back into the reference's
    Detectron2 stack (``torch.save({"model": sd}, path)`` loads through
    ``DetectionCheckpointer`` — reference: detectron_utils.py:30-31),
    and is the parity oracle's input for non-random-weight torch-forward
    verification (tests/test_maskrcnn.py)."""
    p = variables["params"]
    stats = variables["batch_stats"]["backbone"]
    sd: Dict[str, Any] = {}

    def put_conv(key, node, bias=None):
        sd[f"{key}.weight"] = np.asarray(node["kernel"]).transpose(
            3, 2, 0, 1)
        if bias is not None:
            sd[f"{key}.bias"] = np.asarray(node["bias"])

    def put_bn(key, bn, st):
        sd[f"{key}.weight"] = np.asarray(bn["scale"])
        sd[f"{key}.bias"] = np.asarray(bn["bias"])
        sd[f"{key}.running_mean"] = np.asarray(st["mean"])
        sd[f"{key}.running_var"] = np.asarray(st["var"])

    def put_dense(key, node):
        sd[f"{key}.weight"] = np.asarray(node["kernel"]).T
        sd[f"{key}.bias"] = np.asarray(node["bias"])

    bb = p["backbone"]
    put_conv("backbone.bottom_up.stem.conv1", bb["conv1"])
    put_bn("backbone.bottom_up.stem.conv1.norm", bb["bn1"],
           stats["bn1"])
    for stage in range(4):
        for b in range(_STAGE_BLOCKS[stage]):
            name = f"layer{stage + 1}_{b}"
            prefix = f"backbone.bottom_up.res{stage + 2}.{b}"
            for i in (1, 2, 3):
                put_conv(f"{prefix}.conv{i}", bb[name][f"conv{i}"])
                put_bn(f"{prefix}.conv{i}.norm", bb[name][f"bn{i}"],
                       stats[name][f"bn{i}"])
            if b == 0:
                put_conv(f"{prefix}.shortcut", bb[name]["down_conv"])
                put_bn(f"{prefix}.shortcut.norm", bb[name]["down_bn"],
                       stats[name]["down_bn"])

    for i in range(4):
        put_conv(f"backbone.fpn_lateral{i + 2}",
                 p["fpn"][f"lateral{i + 2}"], bias=True)
        put_conv(f"backbone.fpn_output{i + 2}",
                 p["fpn"][f"output{i + 2}"], bias=True)

    put_conv("proposal_generator.rpn_head.conv",
             p["rpn_head"]["conv"], bias=True)
    put_conv("proposal_generator.rpn_head.objectness_logits",
             p["rpn_head"]["objectness"], bias=True)
    put_conv("proposal_generator.rpn_head.anchor_deltas",
             p["rpn_head"]["deltas"], bias=True)

    # fc6 consumes flattened ROI features: flax flattens [S, S, C],
    # torch flattens [C, S, S] — permute back (inverse of _dense_roi)
    fc6 = np.asarray(p["box_head"]["fc6"]["kernel"]).T    # [out, S*S*C]
    out = fc6.shape[0]
    fc6 = fc6.reshape(out, 7, 7, 256).transpose(0, 3, 1, 2).reshape(
        out, -1)
    sd["roi_heads.box_head.fc1.weight"] = fc6
    sd["roi_heads.box_head.fc1.bias"] = np.asarray(
        p["box_head"]["fc6"]["bias"])
    put_dense("roi_heads.box_head.fc2", p["box_head"]["fc7"])
    put_dense("roi_heads.box_predictor.cls_score",
              p["box_predictor"]["cls_score"])
    put_dense("roi_heads.box_predictor.bbox_pred",
              p["box_predictor"]["bbox_pred"])

    for i in range(4):
        put_conv(f"roi_heads.mask_head.mask_fcn{i + 1}",
                 p["mask_head"][f"mask_fcn{i + 1}"], bias=True)
    sd["roi_heads.mask_head.deconv.weight"] = np.asarray(
        p["mask_head"]["deconv_kernel"])                 # [in, out, 2, 2]
    sd["roi_heads.mask_head.deconv.bias"] = np.asarray(
        p["mask_head"]["deconv_bias"])
    put_conv("roi_heads.mask_head.predictor",
             p["mask_head"]["predictor"], bias=True)
    return sd


def load_torch_checkpoint(path: str,
                          config: MaskRCNNConfig = MaskRCNNConfig()):
    """Load ``model_final.pth`` (detectron2) or a torchvision Mask R-CNN
    ``.pth`` — format auto-detected by keys — and return
    ``(variables, config)`` with the format's preprocessing and stride
    conventions applied to the config.  The reference loads the same
    file through DefaultPredictor (mass/thor/detectron_utils.py:30-31)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if any(k.startswith("backbone.bottom_up") for k in sd):
        return params_from_detectron2(sd, config), config
    return (params_from_torchvision_maskrcnn(sd, config),
            config.torchvision_style())
