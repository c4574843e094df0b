"""Mask R-CNN tests: torch-forward numeric parity of every network
stage through the detectron2-format weight import, fixed-shape inference
mechanics, box coding, and mask pasting.

The torch reference here is a functional re-statement of detectron2's
``mask_rcnn_R_50_FPN`` forward (stride-in-1x1 bottlenecks, frozen BN,
FPN, RPN head, 2-FC box head, 4-conv+deconv mask head) driven directly
off the same state dict the import consumes — so one random checkpoint
exercises both the key mapping and the module semantics (reference:
mass/thor/detectron_utils.py + detectron2 model zoo architecture)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mass_tpu.perception import maskrcnn as M


IMG = 64
NCLS = 7

SMALL = M.MaskRCNNConfig(
    num_classes=NCLS, image_size=IMG, pre_nms_topk=64, post_nms_topk=32,
    candidate_pool=64, max_detections=8)


# ---------------------------------------------------------------------
# random detectron2-format checkpoint
# ---------------------------------------------------------------------

_BLOCKS = (3, 4, 6, 3)
_WIDTHS = (64, 128, 256, 512)


def _rand_d2_state_dict(rng, num_classes=NCLS):
    import torch

    sd = {}

    def conv(key, cout, cin, k, bias=False, norm=True):
        w = rng.normal(0, np.sqrt(2.0 / (cin * k * k)),
                       (cout, cin, k, k))
        sd[f"{key}.weight"] = torch.tensor(w, dtype=torch.float32)
        if bias:
            sd[f"{key}.bias"] = torch.tensor(
                rng.normal(0, 0.01, cout), dtype=torch.float32)
        if norm:
            sd[f"{key}.norm.weight"] = torch.tensor(
                rng.uniform(0.9, 1.1, cout), dtype=torch.float32)
            sd[f"{key}.norm.bias"] = torch.tensor(
                rng.normal(0, 0.01, cout), dtype=torch.float32)
            sd[f"{key}.norm.running_mean"] = torch.tensor(
                rng.normal(0, 0.01, cout), dtype=torch.float32)
            sd[f"{key}.norm.running_var"] = torch.tensor(
                rng.uniform(0.5, 1.5, cout), dtype=torch.float32)

    def dense(key, cout, cin):
        sd[f"{key}.weight"] = torch.tensor(
            rng.normal(0, np.sqrt(1.0 / cin), (cout, cin)),
            dtype=torch.float32)
        sd[f"{key}.bias"] = torch.tensor(
            rng.normal(0, 0.01, cout), dtype=torch.float32)

    conv("backbone.bottom_up.stem.conv1", 64, 3, 7)
    cin = 64
    for s in range(4):
        w = _WIDTHS[s]
        for b in range(_BLOCKS[s]):
            pre = f"backbone.bottom_up.res{s + 2}.{b}"
            conv(f"{pre}.conv1", w, cin if b == 0 else w * 4, 1)
            conv(f"{pre}.conv2", w, w, 3)
            conv(f"{pre}.conv3", w * 4, w, 1)
            if b == 0:
                conv(f"{pre}.shortcut", w * 4, cin, 1)
                cin = w * 4

    for i in range(4):
        conv(f"backbone.fpn_lateral{i + 2}", 256, _WIDTHS[i] * 4, 1,
             bias=True, norm=False)
        conv(f"backbone.fpn_output{i + 2}", 256, 256, 3, bias=True,
             norm=False)

    conv("proposal_generator.rpn_head.conv", 256, 256, 3, bias=True,
         norm=False)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1,
         bias=True, norm=False)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1,
         bias=True, norm=False)

    dense("roi_heads.box_head.fc1", 1024, 256 * 7 * 7)
    dense("roi_heads.box_head.fc2", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", num_classes + 1, 1024)
    dense("roi_heads.box_predictor.bbox_pred", num_classes * 4, 1024)

    for i in range(4):
        conv(f"roi_heads.mask_head.mask_fcn{i + 1}", 256, 256, 3,
             bias=True, norm=False)
    sd["roi_heads.mask_head.deconv.weight"] = torch.tensor(
        rng.normal(0, np.sqrt(2.0 / 256), (256, 256, 2, 2)),
        dtype=torch.float32)
    sd["roi_heads.mask_head.deconv.bias"] = torch.tensor(
        rng.normal(0, 0.01, 256), dtype=torch.float32)
    conv("roi_heads.mask_head.predictor", num_classes, 256, 1,
         bias=True, norm=False)
    return sd


# ---------------------------------------------------------------------
# functional torch forward over the d2 state dict
# ---------------------------------------------------------------------

def _torch_features(sd, x):
    """x: [1, 3, H, W] already normalized -> list of P2..P6 tensors."""
    import torch.nn.functional as F

    def conv(x, key, stride=1, pad=0):
        return F.conv2d(x, sd[f"{key}.weight"], sd.get(f"{key}.bias"),
                        stride, pad)

    def cbn(x, key, stride=1, pad=0):
        x = F.conv2d(x, sd[f"{key}.weight"], None, stride, pad)
        n = f"{key}.norm"
        return F.batch_norm(
            x, sd[f"{n}.running_mean"], sd[f"{n}.running_var"],
            sd[f"{n}.weight"], sd[f"{n}.bias"], False)

    x = F.relu(cbn(x, "backbone.bottom_up.stem.conv1", 2, 3))
    x = F.max_pool2d(x, 3, 2, 1)
    cs = []
    for s in range(4):
        for b in range(_BLOCKS[s]):
            pre = f"backbone.bottom_up.res{s + 2}.{b}"
            stride = 2 if (b == 0 and s > 0) else 1
            res = cbn(x, f"{pre}.shortcut", stride) if b == 0 else x
            y = F.relu(cbn(x, f"{pre}.conv1", stride))  # stride in 1x1
            y = F.relu(cbn(y, f"{pre}.conv2", 1, 1))
            y = cbn(y, f"{pre}.conv3")
            x = F.relu(y + res)
        cs.append(x)

    lats = [conv(c, f"backbone.fpn_lateral{i + 2}")
            for i, c in enumerate(cs)]
    tops = [lats[3]]
    for i in (2, 1, 0):
        up = F.interpolate(tops[-1], scale_factor=2, mode="nearest")
        tops.append(up + lats[i])
    tops = tops[::-1]
    outs = [conv(t, f"backbone.fpn_output{i + 2}", pad=1)
            for i, t in enumerate(tops)]
    outs.append(F.max_pool2d(outs[-1], 1, 2))
    return outs


def _torch_rpn(sd, feat):
    import torch.nn.functional as F
    t = F.relu(F.conv2d(feat,
                        sd["proposal_generator.rpn_head.conv.weight"],
                        sd["proposal_generator.rpn_head.conv.bias"],
                        1, 1))
    obj = F.conv2d(
        t, sd["proposal_generator.rpn_head.objectness_logits.weight"],
        sd["proposal_generator.rpn_head.objectness_logits.bias"])
    deltas = F.conv2d(
        t, sd["proposal_generator.rpn_head.anchor_deltas.weight"],
        sd["proposal_generator.rpn_head.anchor_deltas.bias"])
    return obj, deltas


def _torch_box(sd, rois):
    """rois: [N, 256, 7, 7] -> (logits, deltas)."""
    import torch.nn.functional as F
    x = rois.flatten(1)
    x = F.relu(F.linear(x, sd["roi_heads.box_head.fc1.weight"],
                        sd["roi_heads.box_head.fc1.bias"]))
    x = F.relu(F.linear(x, sd["roi_heads.box_head.fc2.weight"],
                        sd["roi_heads.box_head.fc2.bias"]))
    logits = F.linear(x, sd["roi_heads.box_predictor.cls_score.weight"],
                      sd["roi_heads.box_predictor.cls_score.bias"])
    deltas = F.linear(x, sd["roi_heads.box_predictor.bbox_pred.weight"],
                      sd["roi_heads.box_predictor.bbox_pred.bias"])
    return logits, deltas


def _torch_mask(sd, rois):
    import torch.nn.functional as F
    x = rois
    for i in range(4):
        x = F.relu(F.conv2d(
            x, sd[f"roi_heads.mask_head.mask_fcn{i + 1}.weight"],
            sd[f"roi_heads.mask_head.mask_fcn{i + 1}.bias"], 1, 1))
    x = F.relu(F.conv_transpose2d(
        x, sd["roi_heads.mask_head.deconv.weight"],
        sd["roi_heads.mask_head.deconv.bias"], 2))
    return F.conv2d(x, sd["roi_heads.mask_head.predictor.weight"],
                    sd["roi_heads.mask_head.predictor.bias"])


@pytest.fixture(scope="module")
def ckpt():
    rng = np.random.RandomState(0)
    sd = _rand_d2_state_dict(rng)
    variables = M.params_from_detectron2(sd, SMALL)
    model = M.MaskRCNN(SMALL)
    return sd, variables, model


def test_backbone_fpn_rpn_parity(ckpt):
    import torch
    sd, variables, model = ckpt
    rng = np.random.RandomState(1)
    rgb = rng.rand(IMG, IMG, 3).astype(np.float32)

    feats = model.apply(variables, jnp.asarray(rgb)[None],
                        method=M.MaskRCNN.features)

    x = rgb * 255.0
    x = x[..., ::-1] - np.asarray(SMALL.pixel_mean, np.float32)
    tx = torch.tensor(np.ascontiguousarray(
        x.transpose(2, 0, 1).astype(np.float32))[None])
    tfeats = _torch_features(sd, tx)

    def close(a, b, msg):
        # random unnormalized weights blow activations up to ~1e5;
        # tolerate fp32 accumulation noise relative to that scale
        atol = 1e-5 * float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3,
                                   err_msg=msg)

    assert len(feats) == 5
    for i, (jf, tf) in enumerate(zip(feats, tfeats)):
        tj = np.asarray(jf)[0]
        tt = tf.detach().numpy()[0].transpose(1, 2, 0)
        assert tj.shape == tt.shape, f"level {i}"
        close(tj, tt, f"P{i + 2}")

    obj, deltas = model.apply(variables, feats[0],
                              method=M.MaskRCNN.rpn)
    tobj, tdeltas = _torch_rpn(sd, tfeats[0])
    close(np.asarray(obj)[0],
          tobj.detach().numpy()[0].transpose(1, 2, 0), "rpn obj")
    close(np.asarray(deltas)[0],
          tdeltas.detach().numpy()[0].transpose(1, 2, 0), "rpn deltas")


def test_box_and_mask_head_parity(ckpt):
    import torch
    sd, variables, model = ckpt
    rng = np.random.RandomState(2)
    rois7 = rng.normal(0, 1, (5, 7, 7, 256)).astype(np.float32)
    rois14 = rng.normal(0, 1, (5, 14, 14, 256)).astype(np.float32)

    logits, deltas = model.apply(variables, jnp.asarray(rois7),
                                 method=M.MaskRCNN.box)
    tl, td = _torch_box(
        sd, torch.tensor(np.ascontiguousarray(
            rois7.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(logits), tl.detach().numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(deltas).reshape(5, -1), td.detach().numpy(),
        atol=2e-4, rtol=1e-4)

    masks = model.apply(variables, jnp.asarray(rois14),
                        method=M.MaskRCNN.masks)
    tm = _torch_mask(sd, torch.tensor(np.ascontiguousarray(
        rois14.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(masks), tm.detach().numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-4)


def test_torchvision_format_import_matches_d2(ckpt):
    """The same tensors under torchvision key names + bg-first layout
    must import to the identical flax tree."""
    import torch
    sd, variables, _ = ckpt
    tv = {}
    for key, val in sd.items():
        k = key
        k = k.replace("backbone.bottom_up.stem.conv1.norm",
                      "backbone.body.bn1")
        k = k.replace("backbone.bottom_up.stem.conv1",
                      "backbone.body.conv1")
        for s in range(4):
            k = k.replace(f"backbone.bottom_up.res{s + 2}.",
                          f"backbone.body.layer{s + 1}.")
        if ".conv" in k and ".norm." in k and "body" in k:
            for i in (1, 2, 3):
                k = k.replace(f".conv{i}.norm.", f".bn{i}.")
        k = k.replace(".shortcut.norm.", ".downsample.1.")
        k = k.replace(".shortcut.", ".downsample.0.")
        for i in range(4):
            k = k.replace(f"backbone.fpn_lateral{i + 2}.",
                          f"backbone.fpn.inner_blocks.{i}.")
            k = k.replace(f"backbone.fpn_output{i + 2}.",
                          f"backbone.fpn.layer_blocks.{i}.")
        k = k.replace("proposal_generator.rpn_head.conv",
                      "rpn.head.conv")
        k = k.replace("proposal_generator.rpn_head.objectness_logits",
                      "rpn.head.cls_logits")
        k = k.replace("proposal_generator.rpn_head.anchor_deltas",
                      "rpn.head.bbox_pred")
        k = k.replace("roi_heads.box_head.fc1", "roi_heads.box_head.fc6")
        k = k.replace("roi_heads.box_head.fc2", "roi_heads.box_head.fc7")
        k = k.replace("roi_heads.mask_head.deconv",
                      "roi_heads.mask_predictor.conv5_mask")
        k = k.replace("roi_heads.mask_head.predictor",
                      "roi_heads.mask_predictor.mask_fcn_logits")
        tv[k] = val
    # bg-first classifier, bg row prepended to box regression
    cls_w = sd["roi_heads.box_predictor.cls_score.weight"]
    cls_b = sd["roi_heads.box_predictor.cls_score.bias"]
    tv["roi_heads.box_predictor.cls_score.weight"] = torch.cat(
        [cls_w[-1:], cls_w[:-1]])
    tv["roi_heads.box_predictor.cls_score.bias"] = torch.cat(
        [cls_b[-1:], cls_b[:-1]])
    reg_w = sd["roi_heads.box_predictor.bbox_pred.weight"]
    reg_b = sd["roi_heads.box_predictor.bbox_pred.bias"]
    tv["roi_heads.box_predictor.bbox_pred.weight"] = torch.cat(
        [torch.zeros_like(reg_w[:4]), reg_w])
    tv["roi_heads.box_predictor.bbox_pred.bias"] = torch.cat(
        [torch.zeros_like(reg_b[:4]), reg_b])

    variables_tv = M.params_from_torchvision_maskrcnn(tv, SMALL)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(variables_tv)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


# ---------------------------------------------------------------------
# box coding, anchors, pasting, inference mechanics
# ---------------------------------------------------------------------

def test_box_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    xy = rng.rand(20, 2) * 100
    wh = rng.rand(20, 2) * 40 + 4
    anchors = jnp.asarray(
        np.concatenate([xy, xy + wh], -1).astype(np.float32))
    xy2 = rng.rand(20, 2) * 100
    wh2 = rng.rand(20, 2) * 40 + 4
    boxes = jnp.asarray(
        np.concatenate([xy2, xy2 + wh2], -1).astype(np.float32))
    w = M.BOX_REG_WEIGHTS
    out = M.decode_boxes(anchors, M.encode_boxes(anchors, boxes, w), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(boxes),
                               atol=1e-3)


def test_cell_anchor_geometry():
    a = M.cell_anchors(32, (0.5, 1.0, 2.0))
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    assert np.allclose(a[:, :2], -a[:, 2:])          # zero-centered


def test_level_anchor_counts():
    anchors = M.level_anchors(SMALL)
    sizes = [IMG // 4, IMG // 8, IMG // 16, IMG // 32]
    sizes.append((sizes[-1] + 1) // 2)
    for anch, s in zip(anchors, sizes):
        assert anch.shape == (s * s * 3, 4)


def test_paste_masks_box_support_and_values():
    masks = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.asarray([[8.0, 4.0, 24.0, 20.0]])
    out = np.asarray(M.paste_masks(masks, boxes, 32, 32))[0]
    ys, xs = np.nonzero(out > 0.5)
    assert xs.min() >= 8 and xs.max() <= 23
    assert ys.min() >= 4 and ys.max() <= 19
    # interior of the box is exactly 1 (constant mask)
    assert np.allclose(out[6:18, 10:22], 1.0)
    # outside the box strictly zero
    assert out[:4].sum() == 0 and out[:, :8].sum() == 0


def test_detect_fixed_shapes_and_determinism(ckpt):
    _, variables, _ = ckpt
    run = M.make_detector(variables, SMALL)
    rng = np.random.RandomState(4)
    rgb = jnp.asarray(rng.rand(IMG, IMG, 3).astype(np.float32))
    det1 = jax.tree_util.tree_map(np.asarray, run(rgb))
    det2 = jax.tree_util.tree_map(np.asarray, run(rgb))
    assert det1.masks.shape == (SMALL.max_detections, IMG, IMG)
    assert det1.classes.shape == (SMALL.max_detections,)
    assert det1.scores.shape == (SMALL.max_detections,)
    np.testing.assert_array_equal(det1.scores, det2.scores)
    np.testing.assert_array_equal(det1.masks, det2.masks)
    assert np.all(np.isfinite(det1.scores))
    assert np.all(det1.scores >= 0)
    assert np.all((det1.classes >= 0) & (det1.classes < NCLS))
    # padding detections carry empty masks
    empty = det1.scores == 0
    assert det1.masks[empty].sum() == 0


def test_detect_fuses_into_semantic(ckpt):
    from mass_tpu.perception.segmentation import detections_to_semantic
    _, variables, _ = ckpt
    run = M.make_detector(variables, SMALL, class_offset=1)
    rng = np.random.RandomState(5)
    rgb = jnp.asarray(rng.rand(IMG, IMG, 3).astype(np.float32))
    det = run(rgb)
    sem = np.asarray(detections_to_semantic(det, 0.0, NCLS + 1))
    assert sem.shape == (IMG, IMG, 1)
    assert sem.min() >= 0 and sem.max() <= NCLS
