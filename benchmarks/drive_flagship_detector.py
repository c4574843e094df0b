"""Drive the flagship 224px Mask R-CNN through the mapping pipeline.

BASELINE.json config 3 ("Mask R-CNN segmentation -> per-voxel class
painting") exercised with the from-scratch-trained flax checkpoint
(fused-mask val mIoU 0.758, docs/experiments.md): replay a 12-frame
camera spin in a grid-world scene at the reference camera size,
segment each frame with the detector, paint a semantic voxel map from
the fused masks, and compare — per-frame against the GT segmentation,
and map-level against the map painted from GT frames (reference
pipeline being reproduced: SemanticRearrangeSensor's MRCNN path
feeding SemanticProjectionLayer.update,
mass/thor/segmentation_config.py:311-337 + agent.py:341-348).

    python -m benchmarks.drive_flagship_detector \
        --checkpoint /tmp/mrcnn_ckpt/maskrcnn [--platform cpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("flagship detector mapping drive")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--camera-size", type=int, default=224)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--detection-threshold", type=float, default=0.9)
    p.add_argument("--map-size", type=int, default=128,
                   help="map H=W — SPAN-aligned small geometry so the "
                        "drive fits host RAM/time; depth is derived so "
                        "the z-span covers the room floor-to-ceiling")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from mass_tpu import taxonomy
    from mass_tpu.config import CameraConfig, MapGeometry
    from mass_tpu.core import geometry as G
    from mass_tpu.core.voxelmap import VoxelMap
    from mass_tpu.env import rearrange as RR
    from mass_tpu.env.protocol import AgentPose
    from mass_tpu.perception import maskrcnn as mrcnn
    from mass_tpu.perception.segmentation import (
        DetectorSegmentation)
    from mass_tpu.utils.checkpoint import load_pytree

    cam = CameraConfig(height=args.camera_size, width=args.camera_size)
    ncls = 53  # generated datasets skip OccupiedSpace
    cfg = mrcnn.MaskRCNNConfig(num_classes=ncls,
                               image_size=args.camera_size)
    _, like = mrcnn.init_maskrcnn(jax.random.PRNGKey(0), cfg)
    variables = load_pytree(args.checkpoint, like)
    model = mrcnn.make_detector(variables, cfg, class_offset=1)
    sensor = DetectorSegmentation(model, args.detection_threshold)

    ep = RR.generate_episode(args.seed, num_objects=4, num_misplaced=0,
                             num_opened=1, camera=cam)
    world = ep.goal_world
    sx, sy, sz = world.room_size

    res = 2.0 * sx / args.map_size
    # depth must put the FLOOR inside the z-span (objects rest on y=0;
    # a span that misses them zeroes every per-class map IoU silently):
    # cover [0, room height] with bins centred at the span's middle
    map_depth = int(np.ceil((sy + 2 * res) / (8 * res))) * 8
    geo = MapGeometry(args.map_size, args.map_size, map_depth,
                      feature_size=taxonomy.NUM_CLASSES,
                      grid_resolution=res)
    rays = G.camera_rays(cam.height, cam.width, cam.focal_length,
                         cam.focal_length)
    origin = (sx / 2, sz / 2, map_depth * res / 2)
    vm_det = VoxelMap.create(geo, origin)
    vm_gt = VoxelMap.create(geo, origin)

    @jax.jit
    def paint(vm, position, yaw, elevation, depth, classes):
        return vm.update_classes(rays, position, yaw, elevation,
                                 depth, classes)

    ious, times = [], []
    for k in range(args.frames):
        pose = AgentPose(x=sx / 2, y=0.0, z=sz / 2,
                         rotation_degrees=360.0 * k / args.frames,
                         horizon_degrees=30.0)
        rgb, depth, semantic = world.render(cam, pose)
        t0 = time.perf_counter()
        pred = sensor({"rgb": rgb})
        times.append(time.perf_counter() - t0)
        gt = semantic[..., 0]

        # fused-mask IoU over non-background classes present in GT
        inter = union = 0
        for cls in np.unique(gt):
            if cls == 0:
                continue
            pi, gi = pred == cls, gt == cls
            inter += int((pi & gi).sum())
            union += int((pi | gi).sum())
        if union:
            ious.append(inter / union)

        yaw = np.pi / 2 - np.radians(pose.rotation_degrees)
        elev = -np.radians(pose.horizon_degrees)
        position = jnp.asarray([pose.x, pose.z, 1.575], jnp.float32)
        vm_det = paint(vm_det, position, jnp.float32(yaw),
                       jnp.float32(elev), jnp.asarray(depth),
                       jnp.asarray(pred.astype(np.int32)))
        vm_gt = paint(vm_gt, position, jnp.float32(yaw),
                      jnp.float32(elev), jnp.asarray(depth),
                      jnp.asarray(gt.astype(np.int32)))

    # map-level agreement: which classes each map sees, and where
    det_top = np.asarray(vm_det.max_over_depth())
    gt_top = np.asarray(vm_gt.max_over_depth())
    scene_classes = sorted({o.class_id for o in world.objects})
    report = []
    for cls in scene_classes:
        d, g = det_top[..., cls], gt_top[..., cls]
        both = (d > 0.05) & (g > 0.05)
        either = (d > 0.05) | (g > 0.05)
        report.append((taxonomy.CLASS_NAMES[cls],
                       float(both.sum() / max(either.sum(), 1))))

    if not ious:
        raise SystemExit(
            "no frame contained a non-background GT class — raise "
            "--frames or change --seed so the spin sees the objects")
    print(f"frames: {args.frames} @ {args.camera_size}px, "
          f"detector {np.mean(times):.1f}s/frame")
    print(f"fused-mask frame mIoU vs GT: {np.mean(ious):.3f} "
          f"(n={len(ious)})")
    for name, iou in report:
        print(f"  map top-down IoU {name:20s} {iou:.3f}")
    macro = float(np.mean([i for _, i in report]))
    print(f"map-level macro IoU (detector-painted vs GT-painted): "
          f"{macro:.3f}")
    return np.mean(ious), macro


if __name__ == "__main__":
    main()
