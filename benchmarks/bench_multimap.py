"""Multi-map live-step benchmark: fused group update (shared binning,
one dispatch) vs per-map dispatches, at the reference's full geometry
(the reference updates up to 3 projection layers per step from the same
frame — agent.py:107-117).

    python -m benchmarks.bench_multimap
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mass_tpu import taxonomy
    from mass_tpu.config import CameraConfig
    from mass_tpu.maps import MapSet, OccupancyMap, SemanticMap

    cam = CameraConfig(height=224, width=224)
    geo = dict(map_height=384, map_width=384, map_depth=96,
               grid_resolution=0.05)
    rng = np.random.RandomState(0)

    def obs(seed):
        r = np.random.RandomState(seed)
        return dict(
            position=np.asarray([0.0, 0.0, 1.5], np.float32),
            yaw=np.float32(r.uniform(-3, 3)),
            elevation=np.float32(-0.5),
            depth=r.uniform(0.3, 6.0, (224, 224, 1)).astype(np.float32),
            semantic=r.randint(0, taxonomy.NUM_CLASSES,
                               (224, 224, 1)).astype(np.int32))

    def timed(fn, frames=24):
        fn(obs(0))                                   # compile
        t0 = time.perf_counter()
        for i in range(frames):
            fn(obs(1 + i))
        jax.block_until_ready(
            [m.voxel_map.data for m in maps.values()])
        return 1e3 * (time.perf_counter() - t0) / frames

    results = {}

    maps = MapSet(occupancy=OccupancyMap(cam, **geo),
                  semantic0=SemanticMap(cam, taxonomy.NUM_CLASSES,
                                        **geo),
                  semantic1=SemanticMap(cam, taxonomy.NUM_CLASSES,
                                        **geo))
    maps.reset_all((0.0, 0.0, 1.5))

    results["semantic_only_ms"] = timed(
        lambda o: maps.update_group(["semantic0"], o))
    results["fused_occ_sem_ms"] = timed(
        lambda o: maps.update_group(["occupancy", "semantic0"], o))
    results["fused_3_maps_ms"] = timed(
        lambda o: maps.update_group(
            ["occupancy", "semantic0", "semantic1"], o))

    def per_map(o):
        for name in ("occupancy", "semantic0"):
            maps[name].update_from_observation(o)

    results["separate_occ_sem_ms"] = timed(per_map)
    results = {k: round(v, 2) for k, v in results.items()}
    print(results)


if __name__ == "__main__":
    main()
