"""Secondary benchmark: walkthrough-vs-unshuffle map differencing +
instance matching latency (the second metric named in BASELINE.json).

Builds two full-geometry semantic maps with planted instance blobs and
times (a) the all-classes detection sweep and (b) a per-class match
(find x2 + cost matrices + Hungarian).

    python -m benchmarks.bench_match
"""

import time

import numpy as np


def main():
    import jax.numpy as jnp
    from mass_tpu import taxonomy
    from mass_tpu.config import MapGeometry, MatchConfig
    from mass_tpu.core.voxelmap import VoxelMap
    from mass_tpu.match.differences import _detect_all, _match_class

    geo = MapGeometry(384, 384, 96, taxonomy.NUM_CLASSES, 0.05)
    rng = np.random.RandomState(0)

    def planted_map(shift):
        vm = VoxelMap.create(geo)
        # plant straight into the channel-major storage to avoid
        # materializing a dense [H, W, D, F] grid
        data = np.zeros(vm.data.shape, np.float32)
        pc = data.reshape(data.shape[0], 384, 384, 96)
        for k in range(6):  # six object instances across classes
            cls = 1 + (k * 7) % (taxonomy.NUM_CLASSES - 1)
            y, x = 40 + 50 * k, (60 + 40 * k + shift) % 340
            pc[cls, y:y + 8, x:x + 10, 10:18] = 0.8
        import dataclasses
        return dataclasses.replace(vm, data=jnp.asarray(data))

    m0 = planted_map(0)
    m1 = planted_map(25)
    cfg = MatchConfig(contour_padding=0, confidence_threshold=0.1,
                      max_instances=8)
    kw = dict(confidence_threshold=cfg.confidence_threshold,
              contour_padding=cfg.contour_padding,
              contour_threshold=cfg.contour_threshold,
              max_instances=cfg.max_instances)

    both, _, _ = _detect_all(m0, m1, **kw)   # compile
    np.asarray(both)
    t0 = time.perf_counter()
    both, _, _ = _detect_all(m0, m1, **kw)
    both = np.asarray(both)
    detect_ms = 1e3 * (time.perf_counter() - t0)

    cls = int(np.nonzero(both)[0][1])
    out = _match_class(m0, m1, None, None, cls, True, False, **kw)
    np.asarray(out[0])                        # compile
    t0 = time.perf_counter()
    out = _match_class(m0, m1, None, None, cls, True, False, **kw)
    np.asarray(out[0])
    match_ms = 1e3 * (time.perf_counter() - t0)

    print({"detect_all_classes_ms": round(detect_ms, 1),
           "match_one_class_ms": round(match_ms, 1),
           "classes_detected_in_both": int(both.sum())})


if __name__ == "__main__":
    main()
