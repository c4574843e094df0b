"""Episode-fleet serving benchmark: B episodes' semantic maps updated
per step as slabs of one buffer (ONE sort + ONE kernel launch,
parallel/fleet.py) vs B per-episode dispatches — the evaluation-farm
serving shape (the reference runs one episode per GPU process,
agent.py:795-800).

    python -m benchmarks.bench_fleet
"""

import time

import numpy as np


B = 8
CAM_SIZE = 224
GEO_KW = dict(map_height=256, map_width=256, map_depth=64,
              grid_resolution=0.05)   # V = 4.19M (SPAN-multiple)


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mass_tpu import taxonomy
    from mass_tpu.config import CameraConfig, MapGeometry
    from mass_tpu.core.voxelmap import VoxelMap
    from mass_tpu.parallel.fleet import FleetMaps

    cam = CameraConfig(height=CAM_SIZE, width=CAM_SIZE)
    geo = MapGeometry(**GEO_KW)

    def frames(seed):
        rng = np.random.RandomState(seed)
        return dict(
            positions=rng.uniform(-1, 1, (B, 3)).astype(np.float32),
            yaws=rng.uniform(-np.pi, np.pi, B).astype(np.float32),
            elevations=rng.uniform(-0.6, 0.0, B).astype(np.float32),
            depths=rng.uniform(0.3, 6.0, (B, CAM_SIZE, CAM_SIZE, 1)
                               ).astype(np.float32),
            classes={"semantic0": rng.randint(
                0, taxonomy.NUM_CLASSES,
                (B, CAM_SIZE, CAM_SIZE)).astype(np.int32)})

    results = {}

    # --- fleet: one dispatch serves all B episodes
    fleet = FleetMaps(B, cam, geo,
                      {"semantic0": taxonomy.NUM_CLASSES})
    for e in range(B):
        fleet.reset(e, (0.0, 0.0, 1.5))
    fleet.update_batch(**frames(0))          # compile
    jax.block_until_ready(fleet.buffers["semantic0"])
    steps = 8
    t0 = time.perf_counter()
    for s in range(steps):
        fleet.update_batch(**frames(1 + s))
    jax.block_until_ready(fleet.buffers["semantic0"])
    dt = time.perf_counter() - t0
    results["fleet_eps_frames_per_s"] = round(B * steps / dt, 2)
    results["fleet_ms_per_step"] = round(1e3 * dt / steps, 2)
    del fleet

    # --- per-episode dispatches (the B-processes-without-batching shape)
    sg = dataclasses.replace(geo, feature_size=taxonomy.NUM_CLASSES)
    from mass_tpu.core import geometry as G
    rays = G.camera_rays(cam.height, cam.width, cam.focal_length,
                         cam.focal_length)
    maps = [VoxelMap.create(sg, (0.0, 0.0, 1.5)) for _ in range(B)]

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def one(vm, p, y, e, d, c):
        return vm.update_classes(rays, p, y, e, d, c)

    fr = frames(0)
    maps[0] = one(maps[0], jnp.asarray(fr["positions"][0]),
                  jnp.float32(fr["yaws"][0]),
                  jnp.float32(fr["elevations"][0]),
                  jnp.asarray(fr["depths"][0]),
                  jnp.asarray(fr["classes"]["semantic0"][0]))
    jax.block_until_ready(maps[0].data)
    t0 = time.perf_counter()
    for s in range(steps):
        fr = frames(1 + s)
        for e in range(B):
            maps[e] = one(maps[e], jnp.asarray(fr["positions"][e]),
                          jnp.float32(fr["yaws"][e]),
                          jnp.float32(fr["elevations"][e]),
                          jnp.asarray(fr["depths"][e]),
                          jnp.asarray(fr["classes"]["semantic0"][e]))
    jax.block_until_ready([m.data for m in maps])
    dt = time.perf_counter() - t0
    results["sequential_eps_frames_per_s"] = round(B * steps / dt, 2)
    results["sequential_ms_per_step"] = round(1e3 * dt / steps, 2)

    print(results)


if __name__ == "__main__":
    main()
