"""Command-line entry point for running rearrangement experiments.

Mirrors the reference's flag surface (reference: agent.py:786-869) with
a ``--backend`` switch between the THOR gateway and the procedural grid
world, crash recovery around the run, per-run parameter dumps, and
optional episode videos.

    python -m mass_tpu.agent.cli --backend gridworld --total-tasks 5 \
        --ground-truth-segmentation --logdir /tmp/run
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from mass_tpu.agent.loop import RearrangementAgent
from mass_tpu.agent.reliability import run_with_restart
from mass_tpu.config import (AgentConfig, CameraConfig, MatchConfig,
                             NavConfig)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mass_tpu rearrangement agent")
    p.add_argument("--logdir", type=str, default="./mass-tpu-logs")
    p.add_argument("--backend", type=str, default="gridworld",
                   choices=["gridworld", "thor"])

    p.add_argument("--stage", type=str, default="train")
    p.add_argument("--start-task", type=int, default=0)
    p.add_argument("--every-tasks", type=int, default=1)
    p.add_argument("--total-tasks", type=int, default=50)
    p.add_argument("--resume", action="store_true",
                   help="skip tasks whose results/{id}.json already "
                        "exists in --logdir (cross-process resume; "
                        "sequential driver only)")

    # grid-world scene content (ignored by the THOR backend, whose
    # scenes come from the challenge dataset)
    p.add_argument("--num-objects", type=int, default=5)
    p.add_argument("--num-misplaced", type=int, default=2)
    p.add_argument("--num-opened", type=int, default=1)
    p.add_argument("--duplicate-class-pairs", type=int, default=0,
                   help="same-class same-size tinted object pairs with "
                        "one member misplaced: the size-ambiguous "
                        "scenario --use-feature-matching resolves")
    p.add_argument("--room-size", type=float, default=6.0,
                   help="grid-world room side in metres (bigger rooms "
                        "make exploration scarce, the regime where "
                        "search policies matter)")
    p.add_argument("--num-rooms", type=int, default=1,
                   help="partition the grid-world scene into N rooms "
                        "with interior walls + doorways: objects hide "
                        "in occluded side rooms, the regime where "
                        "directed semantic search beats random "
                        "exploration")

    p.add_argument("--ground-truth-segmentation", action="store_true")
    p.add_argument("--detector-checkpoint", type=str, default=None,
                   help="learned-segmentation weights used when "
                        "--ground-truth-segmentation is absent: a "
                        "torch Mask R-CNN .pth (detectron2/"
                        "torchvision), or an orbax dir from "
                        "perception.train_maskrcnn / train_detector")
    p.add_argument("--detector-arch", type=str, default="maskrcnn",
                   choices=["maskrcnn", "unet"],
                   help="architecture of an orbax --detector-checkpoint")
    p.add_argument("--detector-num-classes", type=int, default=None,
                   help="detector class count (default: 54 for .pth "
                        "reference checkpoints, 53 for orbax ones "
                        "trained on the generated dataset)")
    p.add_argument("--ground-truth-disagreement", action="store_true")
    p.add_argument("--ground-truth-semantic-search", action="store_true")
    p.add_argument("--semantic-search-walkthrough", action="store_true")
    p.add_argument("--semantic-search-unshuffle", action="store_true")
    p.add_argument("--frontier-exploration", action="store_true",
                   help="exploration goals go to the FARTHEST "
                        "reachable node that still has frontier "
                        "(unknown bordering observed-free) map cells "
                        "within 1 m, instead of a uniform random node "
                        "— oracle-free directed search "
                        "(nav/grid.frontier_mass; farthest, not "
                        "greatest-mass: measured in "
                        "docs/experiments.md)")
    p.add_argument("--revisit-exploration", action="store_true",
                   help="unshuffle-phase exploration goals revisit the "
                        "walkthrough map's object sites (the matcher's "
                        "own find() localization) — oracle-free "
                        "semantically-targeted search; frontier "
                        "fallback once all sites are visited")
    p.add_argument("--policy-inhibition-radius", type=float, default=0.0,
                   help="mask map cells within this radius (cells) of "
                        "the phase's earlier policy goals before "
                        "sampling the next one — without-replacement "
                        "decoding for the policy head (0 = off)")
    p.add_argument("--use-feature-matching", action="store_true")
    p.add_argument("--record-found-objects", action="store_true")
    p.add_argument("--snapshot-maps", action="store_true",
                   help="dump end-of-episode voxel-map state per task "
                        "(results/maps-{id}.npz) for debugging")
    p.add_argument("--one-phase", action="store_true",
                   help="single-task episodes with dual live/goal "
                        "observations (reference: "
                        "OnePhaseSegmentationConfig)")
    p.add_argument("--reference-compat", action="store_true",
                   help="pin every behavioral generalization to the "
                        "reference's exact rules: separate occupancy "
                        "map, path-length-1 arrival, next-node "
                        "steering, no per-goal step cap")

    p.add_argument("--exploration-budget-one", type=int, default=5)
    p.add_argument("--exploration-budget-two", type=int, default=5)
    p.add_argument("--max-steps", type=int, default=250,
                   help="per-phase step budget (gridworld backend; the "
                        "challenge gives walkthrough 250 and unshuffle "
                        "500 — create_submission.py:45)")
    p.add_argument("--detection-threshold", type=float, default=0.9)

    p.add_argument("--map-height", type=int, default=384)
    p.add_argument("--map-width", type=int, default=384)
    p.add_argument("--map-depth", type=int, default=96)
    p.add_argument("--grid-resolution", type=float, default=0.05)
    p.add_argument("--map-slice-start", type=int, default=20)
    p.add_argument("--map-slice-stop", type=int, default=48)
    p.add_argument("--vertical-fov", type=float, default=90.0)
    p.add_argument("--camera-size", type=int, default=224)
    p.add_argument("--map-precision", type=str, default="default",
                   choices=["default", "highest"],
                   help="splat-kernel MXU precision: 'default' = "
                        "hardware-native bf16-input matmuls (~6.6e-3 "
                        "max-rel map movement on chip, ~1.65x faster); "
                        "'highest' = strict f32 reference parity")

    p.add_argument("--obstacle-threshold", type=float, default=0.0)
    p.add_argument("--obstacle-padding", type=int, default=1)
    p.add_argument("--step-size", type=int, default=5)
    p.add_argument("--max-goal-steps", type=int, default=80)

    p.add_argument("--contour-padding", type=int, default=0)
    p.add_argument("--contour-threshold", type=float, default=0.0)
    p.add_argument("--confidence-threshold", type=float, default=0.0)
    p.add_argument("--distance-threshold", type=float, default=0.05)
    # parsed-but-unused, faithfully: the reference also never reads it
    # (mass/utils/experimentation.py:296-305 thresholds on distance)
    p.add_argument("--deformation-threshold", type=float, default=0.0)

    p.add_argument("--position-noise-std", type=float, default=0.0)
    p.add_argument("--rotation-noise-std", type=float, default=0.0)

    p.add_argument("--policy-checkpoint", type=str, default=None,
                   help="torch policy.pth or orbax dir for the "
                        "semantic-search policy")
    p.add_argument("--backbone-checkpoint", type=str, default=None,
                   help="orbax dir with ResNet stage-1 weights for "
                        "--use-feature-matching (export once with "
                        "perception.resnet.save_backbone_checkpoint "
                        "on a torchvision host)")
    p.add_argument("--videos", action="store_true")
    p.add_argument("--fleet-size", type=int, default=1,
                   help="run episodes in lockstep fleets of this size "
                        "(gridworld backend, no videos): one device "
                        "dispatch per stage serves the whole fleet "
                        "(parallel/evaluator.py)")
    p.add_argument("--shard-map", type=int, default=0,
                   help="row-shard every voxel map over an N-device "
                        "'map' mesh axis (parallel/sharding.py). The "
                        "spatial scaling axis for maps larger than one "
                        "chip's HBM; validate host-side with "
                        "XLA_FLAGS=--xla_force_host_platform_device_"
                        "count=8 --platform cpu --shard-map 8")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force the JAX backend by platform name (cpu, "
                        "tpu, axon, ...). The axon TPU plugin ignores "
                        "JAX_PLATFORMS=cpu, so host-side ablation "
                        "sweeps pass --platform cpu; plugin platforms "
                        "register under their own names, hence no "
                        "fixed choice list")
    return p


def config_from_args(args) -> AgentConfig:
    if args.reference_compat:
        args.max_goal_steps = 0
    return AgentConfig(
        navigate_on_semantic=not args.reference_compat,
        camera=CameraConfig(height=args.camera_size,
                            width=args.camera_size,
                            vertical_fov_degrees=args.vertical_fov),
        map_height=args.map_height, map_width=args.map_width,
        map_depth=args.map_depth, grid_resolution=args.grid_resolution,
        map_precision=args.map_precision,
        nav=NavConfig(step_size=args.step_size,
                      obstacle_padding=args.obstacle_padding,
                      obstacle_threshold=args.obstacle_threshold,
                      map_slice_start=args.map_slice_start,
                      map_slice_stop=args.map_slice_stop,
                      position_noise_std=args.position_noise_std,
                      rotation_noise_std=args.rotation_noise_std,
                      max_goal_steps=args.max_goal_steps,
                      reference_compat=args.reference_compat),
        match=MatchConfig(
            confidence_threshold=args.confidence_threshold,
            contour_padding=args.contour_padding,
            contour_threshold=args.contour_threshold,
            distance_threshold=args.distance_threshold,
            deformation_threshold=args.deformation_threshold),
        exploration_budget_one=args.exploration_budget_one,
        exploration_budget_two=args.exploration_budget_two,
        detection_threshold=args.detection_threshold,
        ground_truth_segmentation=args.ground_truth_segmentation,
        ground_truth_disagreement=args.ground_truth_disagreement,
        ground_truth_semantic_search=args.ground_truth_semantic_search,
        semantic_search_walkthrough=args.semantic_search_walkthrough,
        semantic_search_unshuffle=args.semantic_search_unshuffle,
        frontier_exploration=args.frontier_exploration,
        revisit_exploration=args.revisit_exploration,
        policy_inhibition_radius=args.policy_inhibition_radius,
        use_feature_matching=args.use_feature_matching,
        record_found_objects=args.record_found_objects,
        snapshot_maps=args.snapshot_maps,
        shard_map=args.shard_map,
        one_phase=args.one_phase,
        logdir=args.logdir, stage=args.stage,
        start_task=args.start_task, every_tasks=args.every_tasks,
        total_tasks=args.total_tasks, resume=args.resume)


def load_segmentation_sensor(args):
    """Build the learned-segmentation sensor when GT is off (reference:
    the Mask R-CNN branch of segmentation_config.py:207-218)."""
    if args.ground_truth_segmentation:
        return None
    if args.detector_checkpoint is None:
        raise SystemExit(
            "without --ground-truth-segmentation a learned detector is "
            "required: pass --detector-checkpoint (torch .pth or orbax "
            "dir; the reference's equivalent is "
            "mass/thor/model_final.pth)")
    from mass_tpu.perception.segmentation import DetectorSegmentation
    path = args.detector_checkpoint
    if path.endswith(".pth"):
        from mass_tpu.perception import maskrcnn as mrcnn
        ncls = args.detector_num_classes or 54
        cfg = mrcnn.MaskRCNNConfig(num_classes=ncls,
                                   image_size=args.camera_size)
        variables, cfg = mrcnn.load_torch_checkpoint(path, cfg)
        model = mrcnn.make_detector(variables, cfg, class_offset=0)
        return DetectorSegmentation(model, args.detection_threshold)
    from mass_tpu.utils.checkpoint import load_pytree
    if args.detector_arch == "maskrcnn":
        import jax
        import jax.numpy as jnp
        from mass_tpu.perception import maskrcnn as mrcnn
        ncls = args.detector_num_classes or 53
        cfg = mrcnn.MaskRCNNConfig(num_classes=ncls,
                                   image_size=args.camera_size)
        model, like = mrcnn.init_maskrcnn(jax.random.PRNGKey(0), cfg)
        variables = load_pytree(path, like)
        offset = 1 if ncls < 54 else 0  # dataset ids skip OccupiedSpace
        model = mrcnn.make_detector(variables, cfg, class_offset=offset)
        return DetectorSegmentation(model, args.detection_threshold)
    from mass_tpu.perception.detector import (init_segmenter,
                                              make_segmentation_sensor)
    import jax
    _, like = init_segmenter(jax.random.PRNGKey(0), args.camera_size)
    params = load_pytree(path, like)
    return make_segmentation_sensor(params)


def make_sampler(args, config: AgentConfig):
    if args.backend == "thor":
        from mass_tpu.env.thor import ThorTaskSampler
        sampler = ThorTaskSampler(
            stage=args.stage,
            ground_truth=True,  # learned segmentation wraps below
            detection_threshold=args.detection_threshold,
            screen_size=args.camera_size,
            one_phase=args.one_phase)
    else:
        from mass_tpu.env.rearrange import GridWorldTaskSampler
        seeds = range(args.start_task,
                      args.start_task +
                      args.total_tasks * args.every_tasks + 1)
        sampler = GridWorldTaskSampler(
            list(seeds), camera=config.camera,
            max_steps=args.max_steps, one_phase=args.one_phase,
            num_objects=args.num_objects,
            num_misplaced=args.num_misplaced,
            num_opened=args.num_opened,
            duplicate_class_pairs=args.duplicate_class_pairs,
            room=(args.room_size, 2.5, args.room_size),
            num_rooms=args.num_rooms)
    sensor = load_segmentation_sensor(args)
    if sensor is not None:
        from mass_tpu.perception.segmentation import SegmentationSampler
        sampler = SegmentationSampler(sampler, sensor)
    return sampler


def load_policy(path: Optional[str]):
    if path is None:
        return None
    if path.endswith(".pth"):
        from mass_tpu.search.policy import load_reference_policy
        return load_reference_policy(path)
    from mass_tpu.utils.checkpoint import load_pytree
    return load_pytree(path)


def make_video_factory(args):
    if not args.videos:
        return None
    import imageio

    def factory(task_id: int):
        os.makedirs(os.path.join(args.logdir, "videos"), exist_ok=True)
        try:  # mp4 needs an ffmpeg backend; fall back to gif
            path = os.path.join(args.logdir, "videos",
                                f"{task_id}.mp4")
            writer = imageio.get_writer(path, fps=10)
        except (ValueError, ImportError):
            path = os.path.join(args.logdir, "videos",
                                f"{task_id}.gif")
            writer = imageio.get_writer(path, fps=10)

        class _W:
            def write(self, frame):
                writer.append_data(frame)

            def close(self):
                writer.close()

        return _W()

    return factory


def run_fleet(args, config, policy=None, backbone=None):
    """Lockstep fleet evaluation over the task range: batches of
    ``--fleet-size`` episodes share one device dispatch per stage.

    Both backends serve the same evaluator (it only touches the Task
    protocol): the grid world builds one fresh singleton sampler per
    episode, while the THOR gateway keeps ``--fleet-size`` persistent
    samplers (one Unity process each, the reference's per-process env,
    reference: agent.py:795-800) and skip-advances each slot's task-spec
    iterator to its next task index between batches."""
    assert args.backend in ("gridworld", "thor"), args.backend
    from mass_tpu.agent import metrics as M
    from mass_tpu.parallel.evaluator import FleetEvaluator

    # learned segmentation in fleet mode runs as ONE batched device
    # dispatch per tick inside the evaluator (the samplers stay GT;
    # the evaluator swaps `semantic` exactly like
    # SegmentationTaskWrapper does sequentially)
    sensor = load_segmentation_sensor(args)

    seeds = [args.start_task + k * args.every_tasks
             for k in range(args.total_tasks)]

    if args.backend == "thor":
        from mass_tpu.env.thor import ThorTaskSampler
        slots = [ThorTaskSampler(
            stage=args.stage, ground_truth=True,
            detection_threshold=args.detection_threshold,
            screen_size=args.camera_size, one_phase=args.one_phase)
            for _ in range(min(args.fleet_size, max(len(seeds), 1)))]
        consumed = [0] * len(slots)   # task specs each slot has used

        def batch_samplers(batch):
            out = []
            for i, s in enumerate(batch):
                while consumed[i] < s:           # skip to this task
                    slots[i].skip_task()
                    consumed[i] += 1
                consumed[i] += 1                 # the episode uses it
                out.append(slots[i])
            return out
    else:
        from mass_tpu.env.rearrange import GridWorldTaskSampler

        def batch_samplers(batch):
            return [GridWorldTaskSampler(
                [s], camera=config.camera, max_steps=args.max_steps,
                one_phase=args.one_phase,
                num_objects=args.num_objects,
                num_misplaced=args.num_misplaced,
                num_opened=args.num_opened,
                duplicate_class_pairs=args.duplicate_class_pairs,
                room=(args.room_size, 2.5, args.room_size),
                num_rooms=args.num_rooms)
                for s in batch]

    all_results = []
    for lo in range(0, len(seeds), args.fleet_size):
        batch = seeds[lo:lo + args.fleet_size]
        samplers = batch_samplers(batch)
        evaluator = FleetEvaluator(
            config, samplers, seeds=[args.seed + s for s in batch],
            policy_params=policy, sensor=sensor,
            feature_backbone=backbone)
        for ei, (s, result) in enumerate(zip(batch, evaluator.run())):
            result["task_id"] = s
            if config.logdir:
                M.write_task_metrics(config.logdir, s, result)
                if config.record_found_objects:
                    ep = evaluator.episodes[ei]
                    if not config.one_phase:
                        M.write_found_objects(
                            config.logdir, s, "walkthrough",
                            ep.walk_track, ep.found_positions,
                            ep.found_types)
                    M.write_found_objects(
                        config.logdir, s, "unshuffle",
                        ep.unshuffle_track, ep.found_positions,
                        ep.found_types)
                if config.snapshot_maps:
                    M.write_map_snapshots(
                        config.logdir, s,
                        {n: evaluator.fleet.view(n, ei)
                         for n in evaluator.fleet.buffers})
            all_results.append(result)
    return all_results


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.logdir, exist_ok=True)
    name = (f"{args.start_task}-"
            f"{args.start_task + args.total_tasks * args.every_tasks}")
    with open(os.path.join(args.logdir, f"params-{name}.json"),
              "w") as f:
        json.dump(vars(args), f, indent=4)

    config = config_from_args(args)
    policy = load_policy(args.policy_checkpoint)

    backbone = None
    if args.use_feature_matching:
        if args.backbone_checkpoint:
            from mass_tpu.perception.resnet import \
                load_backbone_checkpoint
            backbone, _ = load_backbone_checkpoint(
                args.backbone_checkpoint)
        else:
            try:
                from mass_tpu.perception.resnet import \
                    load_pretrained_backbone
                backbone, _ = load_pretrained_backbone()
            except ImportError:
                raise SystemExit(
                    "--use-feature-matching needs ResNet stage-1 "
                    "weights: torchvision is unavailable on this host, "
                    "so pass --backbone-checkpoint <orbax dir> "
                    "(export once via "
                    "perception.resnet.save_backbone_checkpoint on a "
                    "torchvision host)")

    def run():
        if args.fleet_size > 1:
            return run_fleet(args, config, policy, backbone)
        sampler = make_sampler(args, config)
        agent = RearrangementAgent(
            config, sampler, policy_params=policy,
            feature_backbone=backbone,
            video_writer_factory=make_video_factory(args),
            rng=np.random.RandomState(args.seed))
        return agent.run()

    metrics = run_with_restart(run)
    if metrics:
        keys = ("unshuffle/prop_fixed_strict", "unshuffle/success")
        means = {k: float(np.mean([m[k] for m in metrics]))
                 for k in keys}
        print(json.dumps(means, indent=2))
    return metrics


if __name__ == "__main__":
    main()
