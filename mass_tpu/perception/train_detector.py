"""Data-parallel detector training over a device mesh.

The reference trains its detector with Detectron2's ``launch`` (one
process per GPU, NCCL DDP; reference: train_maskrcnn.py:133-136).  Here
the training step is a single jitted SPMD program: the batch shards
over the mesh's ``data`` axis, parameters are replicated, and jit's
automatic collectives reduce gradients over ICI (SURVEY.md §5.8) — the
same step runs single-chip, multi-chip, or on the virtual CPU mesh.

    python -m mass_tpu.perception.train_detector --dataset d \
        --epochs 2 --batch-size 8 --logdir /tmp/det
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mass_tpu import taxonomy
from mass_tpu.parallel.mesh import make_mesh
from mass_tpu.perception.detector import SegmenterUNet


def load_split(dataset_dir: str, split: str = "training"):
    """Images + per-pixel class targets from the detector-dataset layout
    (tools/detector_dataset.py)."""
    import imageio.v2 as imageio
    with open(os.path.join(dataset_dir, f"{split}.json")) as f:
        records = json.load(f)
    images, targets = [], []
    for rec in records:
        rgb = imageio.imread(rec["file_name"]).astype(np.float32) / 255.0
        sem_path = rec["file_name"].replace("-rgb.png", "-sem.png")
        sem = imageio.imread(sem_path).astype(np.int32)
        images.append(rgb[..., :3])
        targets.append(sem)
    return np.stack(images), np.stack(targets)


def batches(images, targets, batch_size: int,
            rng: np.random.RandomState) -> Iterator[Tuple]:
    order = rng.permutation(len(images))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        sel = order[i:i + batch_size]
        yield images[sel], targets[sel]


def class_weights(targets: np.ndarray,
                  num_classes: int = taxonomy.NUM_CLASSES) -> np.ndarray:
    """Inverse-sqrt-frequency class weights, mean-normalized: object
    pixels are <1% of a frame, so plain CE collapses to the background
    classes (the reference's Mask R-CNN sidesteps this with per-ROI
    sampling; the per-pixel trainer reweights instead)."""
    freq = np.bincount(targets.reshape(-1).astype(np.int64),
                       minlength=num_classes) + 1
    w = 1.0 / np.sqrt(freq)
    return (w / w.mean()).astype(np.float32)


def make_train_step(model, tx, mesh, weights=None):
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    w = (jnp.asarray(weights) if weights is not None
         else jnp.ones((taxonomy.NUM_CLASSES,), jnp.float32))

    def loss_fn(params, rgb, sem):
        logits = model.apply(params, rgb)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, sem)
        return (ce * w[sem]).mean()

    @jax.jit
    def step(params, opt_state, rgb, sem):
        loss, grads = jax.value_and_grad(loss_fn)(params, rgb, sem)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, rgb, sem):
        rgb = jax.device_put(jnp.asarray(rgb), batch_sh)
        sem = jax.device_put(jnp.asarray(sem), batch_sh)
        params = jax.device_put(params, rep)
        return step(params, opt_state, rgb, sem)

    return run


def evaluate(model, params, images, targets, batch_size: int = 8):
    """Mean IoU + pixel accuracy over a split."""
    num_classes = taxonomy.NUM_CLASSES

    @jax.jit
    def confusion(rgb, sem):
        pred = jnp.argmax(model.apply(params, rgb), axis=-1)
        idx = sem * num_classes + pred
        return jnp.bincount(idx.reshape(-1),
                            length=num_classes * num_classes)

    total = np.zeros(num_classes * num_classes, np.int64)
    for i in range(0, len(images), batch_size):
        total += np.asarray(confusion(
            jnp.asarray(images[i:i + batch_size]),
            jnp.asarray(targets[i:i + batch_size])))
    cm = total.reshape(num_classes, num_classes)
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    seen = union > 0
    miou = float((inter[seen] / union[seen]).mean()) if seen.any() \
        else 0.0
    acc = float(inter.sum() / max(cm.sum(), 1))
    return dict(miou=miou, pixel_accuracy=acc)


def train(dataset_dir: str, logdir: str, epochs: int = 1,
          batch_size: int = 8, learning_rate: float = 3e-4,
          seed: int = 0, image_size: int = None,
          class_weighting: bool = True):
    images, targets = load_split(dataset_dir, "training")
    val = load_split(dataset_dir, "validation")
    # the data axis must divide the batch
    n_data = jax.device_count()
    while batch_size % n_data:
        n_data -= 1
    mesh = make_mesh((n_data,), ("data",))

    model = SegmenterUNet()
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1,) + images.shape[1:3] + (3,)))
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    run = make_train_step(
        model, tx, mesh,
        class_weights(targets) if class_weighting else None)

    rng = np.random.RandomState(seed)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        losses = []
        for rgb, sem in batches(images, targets, batch_size, rng):
            params, opt_state, loss = run(params, opt_state, rgb, sem)
            losses.append(float(loss))
        metrics = evaluate(model, params, *val)
        metrics.update(epoch=epoch, loss=float(np.mean(losses)),
                       sec=time.time() - t0)
        history.append(metrics)
        print(metrics)

    if logdir:
        os.makedirs(logdir, exist_ok=True)
        from mass_tpu.utils.checkpoint import save_pytree
        save_pytree(os.path.join(logdir, "segmenter"), params)
        with open(os.path.join(logdir, "history.json"), "w") as f:
            json.dump(history, f, indent=2)
    return params, history


def main(argv=None):
    p = argparse.ArgumentParser("detector trainer")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-class-weighting", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform name (cpu, tpu, axon, ...)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    train(args.dataset, args.logdir, args.epochs, args.batch_size,
          args.learning_rate, args.seed,
          class_weighting=not args.no_class_weighting)


if __name__ == "__main__":
    main()
