"""Mask R-CNN training tests: target assignment semantics, one jitted
SPMD step on the virtual device mesh, and optimization progress on a
synthetic instance scene (reference analog: train_maskrcnn.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mass_tpu.ops.detection import box_iou
from mass_tpu.parallel.mesh import make_mesh
from mass_tpu.perception import maskrcnn as M
from mass_tpu.perception import maskrcnn_train as T


IMG = 64
NCLS = 3

CFG = M.MaskRCNNConfig(
    num_classes=NCLS, image_size=IMG, pre_nms_topk=32, post_nms_topk=16,
    candidate_pool=32, max_detections=8)
TCFG = T.TrainConfig(max_gt=4, rpn_pos_samples=8, rpn_neg_samples=24,
                     roi_fg_samples=8, roi_bg_samples=24)


def _scene(rng):
    """One image with two axis-aligned bright rectangles (classes 0/1)."""
    rgb = np.full((IMG, IMG, 3), 0.1, np.float32)
    boxes = np.zeros((TCFG.max_gt, 4), np.float32)
    classes = np.zeros((TCFG.max_gt,), np.int32)
    masks = np.zeros((TCFG.max_gt, IMG, IMG), np.float32)
    valid = np.zeros((TCFG.max_gt,), bool)
    for i, cls in enumerate([0, 1]):
        w, h = rng.randint(12, 20, 2)
        x = rng.randint(2, IMG - w - 2)
        y = rng.randint(2, IMG - h - 2)
        rgb[y:y + h, x:x + w, cls] = 0.9
        boxes[i] = (x, y, x + w, y + h)
        classes[i] = cls
        masks[i, y:y + h, x:x + w] = 1.0
        valid[i] = True
    return rgb, boxes, classes, masks, valid


def _batch(rng, n):
    cols = [_scene(rng) for _ in range(n)]
    return tuple(np.stack([c[i] for c in cols]) for i in range(5))


def test_rpn_targets_force_positive_and_thresholds():
    anchors = jnp.asarray([[0., 0., 10., 10.],
                           [0., 0., 9., 11.],
                           [30., 30., 40., 40.],
                           [100., 100., 110., 110.]])
    gt = jnp.asarray([[0., 0., 10., 10.],
                      [31., 31., 39., 39.],
                      [0., 0., 0., 0.]])
    valid = jnp.asarray([True, True, False])
    pos, neg, best_gt = T.rpn_targets(T.TrainConfig(), anchors, gt,
                                      valid)
    pos, neg, best_gt = map(np.asarray, (pos, neg, best_gt))
    assert pos[0] and best_gt[0] == 0          # IoU 1.0
    assert pos[2] and best_gt[2] == 1          # forced: best for gt 1
    assert neg[3]                              # IoU 0 everywhere
    assert not pos[3]


def test_sample_eligible_fixed_shape_weights():
    eligible = jnp.asarray([True, False, True, False, False])
    idx, w = T.sample_eligible(eligible, 4, jax.random.PRNGKey(0))
    idx, w = np.asarray(idx), np.asarray(w)
    assert idx.shape == (4,) and w.shape == (4,)
    assert w.sum() == 2.0                      # only 2 eligible
    chosen = set(idx[w > 0].tolist())
    assert chosen == {0, 2}


@pytest.fixture(scope="module")
def trainer():
    model = M.MaskRCNN(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3)))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(0.0025, momentum=0.9))
    opt_state = tx.init(variables["params"])
    n = 2 if jax.device_count() >= 2 else 1
    mesh = make_mesh((n,), ("data",))
    run = T.make_train_step(model, tx, TCFG, mesh)
    return model, variables, opt_state, run


def test_train_step_runs_and_updates(trainer):
    model, variables, opt_state, run = trainer
    batch = _batch(np.random.RandomState(0), 2)
    v2, opt_state, losses = run(variables, opt_state, batch,
                                jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total"]) > 0
    # parameters moved
    a = jax.tree_util.tree_leaves(variables["params"])[0]
    b = jax.tree_util.tree_leaves(v2["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # frozen batch stats untouched
    sa = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    sb = jax.tree_util.tree_leaves(v2["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch(trainer):
    model, variables, opt_state, run = trainer
    batch = _batch(np.random.RandomState(1), 2)
    first = None
    key = jax.random.PRNGKey(2)
    for i in range(8):
        key, sub = jax.random.split(key)
        variables, opt_state, losses = run(variables, opt_state, batch,
                                           sub)
        total = float(losses["total"])
        if first is None:
            first = total
    assert total < first, (first, total)


def _write_dataset(path, n_images, seed, shift=0):
    """Tiny on-disk instance dataset in the trainer's format (training
    split only, so validation scoring is skipped).  ``shift`` offsets
    rectangle placement — the 'perturbed split' of the fine-tune
    scenario."""
    import json
    import os
    from mass_tpu.tools.detector_dataset import record_from_frame
    rng = np.random.RandomState(seed)
    records = []
    for i in range(n_images):
        rgb = np.full((IMG, IMG, 3), 0.1, np.float32)
        sem = np.zeros((IMG, IMG), np.int32)
        for cls in (1, 2):
            w, h = rng.randint(14, 20, 2)
            x = (rng.randint(2, IMG - w - 2) + shift) % (IMG - w - 2)
            y = rng.randint(2, IMG - h - 2)
            rgb[y:y + h, x:x + w, cls - 1] = 0.9
            sem[y:y + h, x:x + w] = cls
        records.append(record_from_frame(rgb, sem, i, str(path)))
    with open(os.path.join(str(path), "training.json"), "w") as f:
        json.dump(records, f)
    return str(path)


def _schedule_count(opt_state):
    leaves = [l for l in jax.tree_util.tree_leaves(opt_state)
              if hasattr(l, "dtype") and l.dtype == jnp.int32
              and np.ndim(l) == 0]
    assert leaves, "no schedule count leaf in opt state"
    return int(leaves[0])


@pytest.mark.slow
def test_resume_restores_optimizer_and_finetune_inits_weights(tmp_path):
    """The two warm-start routes end to end (VERDICT r4 item 8):
    --resume continues the optimizer (momentum + LR-schedule step, so
    the decay does NOT restart), --init-checkpoint fine-tunes another
    run's weights with a fresh optimizer (the COCO->THOR route,
    reference train_maskrcnn.py:72-99, a prior run standing in for the
    COCO zoo)."""
    import optax as ox
    from mass_tpu.utils.checkpoint import load_pytree

    ds = _write_dataset(tmp_path / "ds", 6, seed=0)
    run1 = str(tmp_path / "run1")
    v1, h1 = T.train(ds, run1, epochs=2, batch_size=2,
                     learning_rate=0.02, seed=0, config=CFG, tcfg=TCFG)
    # 6 images / batch 2 = 3 steps/epoch, 2 epochs = 6 steps recorded
    # in the saved schedule count
    model = M.MaskRCNN(CFG)
    # template with a CALLABLE lr: the trainer's sgd(schedule) carries
    # a schedule-count state that a float lr would not
    tx = ox.chain(ox.clip_by_global_norm(10.0),
                  ox.sgd(ox.constant_schedule(0.02), momentum=0.9))
    template = tx.init(v1["params"])
    saved = load_pytree(f"{run1}/maskrcnn-opt", template)
    assert _schedule_count(saved) == 6

    # resume: 2 more epochs pick up at step 6, not step 0
    v2, h2 = T.train(ds, run1, epochs=2, batch_size=2,
                     learning_rate=0.02, seed=1, config=CFG, tcfg=TCFG,
                     resume=True)
    resumed = load_pytree(f"{run1}/maskrcnn-opt", template)
    assert _schedule_count(resumed) == 12, (
        "resume restarted the optimizer instead of restoring its state")
    # loss CONTINUES from the trained level instead of restarting at
    # the from-scratch level
    assert h2[0]["total"] < h1[0]["total"], (h1[0], h2[0])

    # fine-tune route on a perturbed split: the init REALLY is run1's
    # checkpoint (epochs=0 returns the initialized state untouched —
    # deterministic, unlike a did-warm-start-help loss comparison on a
    # 6-image toy dataset), and a training epoch from it runs to
    # finite losses
    ds2 = _write_dataset(tmp_path / "ds2", 6, seed=3, shift=17)
    v_init, _ = T.train(ds2, None, epochs=0, batch_size=2,
                        learning_rate=0.02, seed=7, config=CFG,
                        tcfg=TCFG, init_checkpoint=f"{run1}/maskrcnn")
    # v2 is what run1's logdir checkpoint holds after the resumed run;
    # compare against a fresh load of that checkpoint
    ckpt = load_pytree(f"{run1}/maskrcnn",
                       M.MaskRCNN(CFG).init(
                           jax.random.PRNGKey(7),
                           jnp.zeros((1, IMG, IMG, 3))))
    for a, b in zip(jax.tree_util.tree_leaves(v_init["params"]),
                    jax.tree_util.tree_leaves(ckpt["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, h_ft = T.train(ds2, str(tmp_path / "ft"), epochs=1,
                      batch_size=2, learning_rate=0.02, seed=0,
                      config=CFG, tcfg=TCFG,
                      init_checkpoint=f"{run1}/maskrcnn")
    assert np.isfinite(h_ft[0]["total"])


def test_dataset_rasterization_roundtrip(tmp_path):
    """record_from_frame -> rasterize_record reproduces boxes, classes
    and (approximately) masks."""
    from mass_tpu.tools.detector_dataset import record_from_frame
    sem = np.zeros((IMG, IMG), np.int32)
    sem[10:26, 8:28] = 5
    sem[40:56, 36:52] = 9
    rgb = np.random.RandomState(0).rand(IMG, IMG, 3).astype(np.float32)
    record = record_from_frame(rgb, sem, 0, str(tmp_path))
    out_rgb, boxes, classes, masks, valid = T.rasterize_record(
        record, max_gt=4)
    assert valid.sum() == 2
    got = {(int(c), tuple(map(int, b))) for c, b in
           zip(classes[valid], boxes[valid])}
    assert (4, (8, 10, 28, 26)) in got         # category_id = class - 1
    assert (8, (36, 40, 52, 56)) in got
    for i in range(2):
        x0, y0, x1, y1 = map(int, boxes[i])
        inside = masks[i, y0:y1, x0:x1]
        assert inside.mean() > 0.85            # polygon fill covers box
        outside = masks[i].sum() - inside.sum()
        assert outside / max(masks[i].sum(), 1) < 0.1


def test_gt_box_appended_makes_foreground():
    """With gt boxes appended to proposals, at least one ROI sample is
    foreground even from a cold RPN."""
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in M.level_anchors(CFG)])
    gt = jnp.asarray([[10., 10., 30., 30.]] +
                     [[0., 0., 0., 0.]] * (TCFG.max_gt - 1))
    valid = jnp.asarray([True] + [False] * (TCFG.max_gt - 1))
    proposals = jnp.zeros((CFG.post_nms_topk, 4))
    rois = jnp.concatenate([proposals, gt])
    iou = box_iou(rois, gt)
    iou = jnp.where(valid[None], iou, 0.0)
    assert float(iou.max()) == 1.0


def test_flip_batch_mirrors_boxes_masks_and_images():
    """Horizontal-flip augmentation: flipped entries mirror images and
    masks along x and reflect box x-coordinates; unflipped entries and
    empty gt slots are untouched."""
    rng = np.random.RandomState(3)
    batch = _batch(rng, 2)
    images, boxes, classes, masks, valid = (x.copy() for x in batch)
    out = T.flip_batch(batch, np.asarray([True, False]))
    o_img, o_boxes, o_cls, o_masks, o_valid = out

    np.testing.assert_array_equal(o_img[0], images[0][:, ::-1])
    np.testing.assert_array_equal(o_img[1], images[1])
    np.testing.assert_array_equal(o_cls, classes)
    np.testing.assert_array_equal(o_valid, valid)

    w = images.shape[2]
    for i in range(TCFG.max_gt):
        if valid[0, i]:
            x0, y0, x1, y1 = boxes[0, i]
            np.testing.assert_allclose(o_boxes[0, i],
                                       [w - x1, y0, w - x0, y1])
            np.testing.assert_array_equal(o_masks[0, i],
                                          masks[0, i][:, ::-1])
            # the flipped mask still fills the flipped box
            fx0, _, fx1, _ = map(int, o_boxes[0, i])
            assert o_masks[0, i][:, fx0:fx1].sum() == masks[0, i].sum()
        else:
            np.testing.assert_array_equal(o_boxes[0, i], 0.0)
    np.testing.assert_array_equal(o_boxes[1], boxes[1])
