"""Detection ops + trainable segmenter tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mass_tpu.ops.detection import box_iou, nms, roi_align


def test_box_iou_known_values():
    a = jnp.asarray([[0., 0., 2., 2.]])
    b = jnp.asarray([[1., 1., 3., 3.], [0., 0., 2., 2.],
                     [5., 5., 6., 6.]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0., 0., 10., 10.],
                         [1., 1., 11., 11.],     # overlaps box 0
                         [20., 20., 30., 30.],
                         [21., 21., 31., 31.]])  # overlaps box 2
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.1])
    keep = np.asarray(jax.jit(
        lambda b, s: nms(b, s, 0.5, 4))(boxes, scores))
    kept = [k for k in keep.tolist() if k >= 0]
    assert kept == [2, 0]


def test_nms_matches_torchvision_style_reference():
    rng = np.random.RandomState(0)
    xy = rng.rand(30, 2) * 50
    wh = rng.rand(30, 2) * 20 + 2
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(30).astype(np.float32)

    def ref_nms(boxes, scores, thr):
        idx = np.argsort(-scores)
        keep = []
        while len(idx):
            i = idx[0]
            keep.append(i)
            rest = idx[1:]
            iou = np.asarray(box_iou(jnp.asarray(boxes[i][None]),
                                     jnp.asarray(boxes[rest])))[0]
            idx = rest[iou < 0.4]
        return keep

    keep = [k for k in np.asarray(nms(jnp.asarray(boxes),
                                      jnp.asarray(scores), 0.4,
                                      30)).tolist() if k >= 0]
    assert keep == ref_nms(boxes, scores, 0.4)


def test_roi_align_constant_region():
    feats = jnp.ones((16, 16, 3)) * 5.0
    boxes = jnp.asarray([[2., 2., 10., 10.]])
    out = np.asarray(roi_align(feats, boxes, 4))
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(out, 5.0, atol=1e-5)


def test_roi_align_gradient_field():
    """Sampling a linear ramp returns the ramp's values at cell centres."""
    h = w = 16
    ramp = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :, None], (h, w, 1))
    boxes = jnp.asarray([[4., 4., 12., 12.]])
    out = np.asarray(roi_align(ramp, boxes, 4, sampling_ratio=1))[0]
    # cell centres at x = 5, 7, 9, 11 -> value = x - 0.5
    np.testing.assert_allclose(out[0, :, 0], [4.5, 6.5, 8.5, 10.5],
                               atol=1e-4)


@pytest.mark.slow
def test_segmenter_training_learns(tmp_path):
    """End-to-end: generate a small dataset, train the segmenter on the
    8-device CPU mesh, verify mIoU improves over untrained."""
    from mass_tpu.tools.detector_dataset import generate, format_dataset
    from mass_tpu.perception.train_detector import (evaluate, load_split,
                                                    train)
    from mass_tpu.perception.detector import SegmenterUNet

    generate(str(tmp_path), total_tasks=2, poses_per_scene=6,
             camera_size=64)
    format_dataset(str(tmp_path), validation_fraction=0.2)

    model = SegmenterUNet()
    val = load_split(str(tmp_path), "validation")
    params0 = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    before = evaluate(model, params0, *val)

    params, history = train(str(tmp_path), None, epochs=3,
                            batch_size=4)
    after = evaluate(model, params, *val)
    assert history[-1]["loss"] < history[0]["loss"]
    assert after["pixel_accuracy"] > before["pixel_accuracy"]
    assert after["pixel_accuracy"] > 0.5  # background dominates quickly


def test_instances_from_logits_roundtrip():
    """Logit image with two blobs -> Detections -> mask fusion returns
    the original class image."""
    from mass_tpu.perception.detector import instances_from_logits
    from mass_tpu.perception.segmentation import detections_to_semantic

    h = w = 24
    classes = np.zeros((h, w), np.int64)
    classes[2:8, 2:8] = 5
    classes[14:20, 10:22] = 9
    logits = np.full((h, w, 12), -5.0, np.float32)
    logits[np.arange(h)[:, None], np.arange(w)[None, :], classes] = 5.0

    det = instances_from_logits(jnp.asarray(logits), max_instances=8)
    scores = np.asarray(det.scores)
    kept = scores > 0.5
    assert kept.sum() == 2
    assert sorted(np.asarray(det.classes)[kept].tolist()) == [5, 9]

    sem = np.asarray(detections_to_semantic(det, 0.5,
                                            num_classes=12))[..., 0]
    np.testing.assert_array_equal(sem, classes)
