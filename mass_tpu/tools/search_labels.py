"""Dump semantic-search training labels: GT goal positions in map cells.

The training targets for the search policy — per task, the map-frame
cells of misplaced objects' walkthrough and unshuffle positions
(reference: get_search_labels.py; the reference never shipped the
trainer itself — mass_tpu.search.train consumes these).

    python -m mass_tpu.tools.search_labels --total-tasks 20 \
        --logdir /tmp/labels
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mass_tpu.agent import oracle
from mass_tpu.config import CameraConfig, MapGeometry
from mass_tpu.core.voxelmap import VoxelMap


def dump_labels(sampler, geometry: MapGeometry, logdir: str,
                start_task: int, total_tasks: int) -> int:
    os.makedirs(logdir, exist_ok=True)
    written = 0
    for task_id in range(start_task, start_task + total_tasks):
        walkthrough = sampler.next_task()
        unshuffle = sampler.next_task()
        loc = walkthrough.agent_location()
        vm = VoxelMap.create(geometry, (loc.x, loc.z, loc.y))

        walk_cells, unshuffle_cells = [], []
        for current, target in oracle.scene_difference_positions(
                unshuffle):
            walk_cells.append(np.asarray(vm.world_to_map(target)))
            unshuffle_cells.append(np.asarray(vm.world_to_map(current)))
        if walk_cells:
            np.save(os.path.join(
                logdir, f"walkthrough-labels-{task_id}.npy"),
                np.stack(walk_cells))
            np.save(os.path.join(
                logdir, f"unshuffle-labels-{task_id}.npy"),
                np.stack(unshuffle_cells))
            written += 1
    return written


def main(argv=None):
    p = argparse.ArgumentParser("search-label dumper")
    p.add_argument("--logdir", type=str, required=True)
    p.add_argument("--start-task", type=int, default=0)
    p.add_argument("--total-tasks", type=int, default=20)
    p.add_argument("--backend", type=str, default="gridworld",
                   choices=["gridworld", "thor"])
    p.add_argument("--map-height", type=int, default=384)
    p.add_argument("--map-width", type=int, default=384)
    p.add_argument("--map-depth", type=int, default=96)
    p.add_argument("--grid-resolution", type=float, default=0.05)
    p.add_argument("--camera-size", type=int, default=224)
    args = p.parse_args(argv)

    camera = CameraConfig(height=args.camera_size,
                          width=args.camera_size)
    if args.backend == "thor":
        from mass_tpu.env.thor import ThorTaskSampler
        sampler = ThorTaskSampler(screen_size=args.camera_size)
    else:
        from mass_tpu.env.rearrange import GridWorldTaskSampler
        sampler = GridWorldTaskSampler(
            list(range(args.start_task,
                       args.start_task + args.total_tasks)),
            camera=camera)

    geometry = MapGeometry(args.map_height, args.map_width,
                           args.map_depth,
                           grid_resolution=args.grid_resolution)
    n = dump_labels(sampler, geometry, args.logdir, args.start_task,
                    args.total_tasks)
    print(f"wrote labels for {n} tasks to {args.logdir}")


if __name__ == "__main__":
    main()
