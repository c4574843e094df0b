"""Headline benchmark: RGB-D frame -> semantic voxel-map update throughput.

Measures the framework's jitted semantic mapping step (224x224 RGB-D +
segmentation -> one-hot -> trilinear scatter into a 384x384x96x54 grid,
the per-step hot path of the agent loop, SURVEY.md §3.2) on the current
JAX default device, against the reference pipeline's torch-CPU
throughput (benchmarks/torch_baseline.py — the reference ships
CUDA/torch code with no published numbers, so the baseline is measured,
see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import os
import time

import numpy as np


CAMERA = 224
MAP_H, MAP_W, MAP_D, NUM_CLASSES = 384, 384, 96, 54
FRAMES = int(os.environ.get("BENCH_FRAMES", "128"))
# frames folded per kernel launch (>1 routes through
# ops/pallas_splat.splat_onehot_frames_cmajor — parity-exact, but
# measured perf-neutral on the tunnel: per-frame binning/sort prep
# dominates, see docs/performance.md)
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
BASELINE_FRAMES = int(os.environ.get("BENCH_BASELINE_FRAMES", "6"))
# splat-kernel MXU precision: "default" (hardware-native bf16-input
# matmuls, the production default) or "highest" (strict-parity f32,
# ~1.65x slower on chip) — docs/performance.md "MXU precision on chip"
PRECISION = os.environ.get("BENCH_PRECISION", "default")
if PRECISION not in ("default", "highest"):
    raise SystemExit(
        f"BENCH_PRECISION must be 'default' or 'highest', "
        f"got {PRECISION!r}")
# timed repeats; the reported value is their median (one rep is
# exposed to tunnel noise — BENCH_r03 lost 30% to a single sample)
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# Pinned idle-box torch-CPU baseline (frames/sec) for the headline
# ratio.  The live-measured baseline swings >2x with host load (2.19
# fps idle -> ~1.0 fps sharing the 1-core box with an episode sweep,
# docs/performance.md "Remaining headroom"), which made vs_baseline
# box-state-dependent across driver rounds (BENCH_r04 recorded 179.9x
# while the idle-box ratio is ~95-119x).  2.19 is the best idle-box
# measurement of benchmarks/torch_baseline.py at this exact geometry
# (1-core host, round 4) — the CONSERVATIVE pin: a loaded box can only
# make the reference look slower, never faster.  The live measurement
# still ships in the JSON as vs_baseline_live / baseline_fps.
BASELINE_IDLE_FPS = 2.19


def measure_tpu():
    import jax
    import jax.numpy as jnp
    from mass_tpu.config import CameraConfig, MapGeometry
    from mass_tpu.core import geometry as G
    from mass_tpu.core.voxelmap import VoxelMap

    cam = CameraConfig(height=CAMERA, width=CAMERA)
    geo = MapGeometry(map_height=MAP_H, map_width=MAP_W, map_depth=MAP_D,
                      feature_size=NUM_CLASSES, precision=PRECISION)
    rays = G.camera_rays(cam.height, cam.width,
                        cam.focal_length, cam.focal_length)

    # one dispatch scans the whole frame stream in BATCH-frame groups:
    # sequential EMA semantics (scan carry + in-kernel frame order)
    # without per-frame host round-trips or per-frame span DMAs
    @functools.partial(jax.jit, donate_argnums=0)
    def run_chunk(vm, positions, yaws, elevations, depths, semantics):
        if BATCH <= 1:                       # per-frame kernel launches
            def body(m, frame):
                p, y, e, d, s = frame
                return m.update_classes(rays, p, y, e, d, s), None
            vm, _ = jax.lax.scan(
                body, vm,
                (positions, yaws, elevations, depths, semantics))
            return vm

        def body(m, group):
            p, y, e, d, s = group
            return m.update_classes_frames(rays, p, y, e, d, s), None
        groups = tuple(
            x.reshape((-1, BATCH) + x.shape[1:])
            for x in (positions, yaws, elevations, depths, semantics))
        vm, _ = jax.lax.scan(body, vm, groups)
        return vm

    rng = np.random.RandomState(0)

    def chunk(k):
        return (jnp.asarray(rng.uniform(-1, 1, (k, 3)).astype(np.float32)),
                jnp.asarray(rng.uniform(
                    -np.pi, np.pi, k).astype(np.float32)),
                jnp.asarray(rng.uniform(-0.6, 0.0, k).astype(np.float32)),
                jnp.asarray(rng.uniform(
                    0.3, 4.0, (k, CAMERA, CAMERA, 1)).astype(np.float32)),
                jnp.asarray(rng.randint(
                    0, NUM_CLASSES, (k, CAMERA, CAMERA)).astype(np.int32)))

    vm = VoxelMap.create(geo, (0.0, 0.0, 0.0))
    frames = chunk(FRAMES)
    # inputs MUST be on device before the timer starts: ~52 MB of
    # host->device transfers left in flight would drain inside the
    # timed window (measured: 124 vs 206 fps at FRAMES=128 through the
    # tunnel — the whole BENCH_r03-vs-docs 137/200 discrepancy)
    jax.block_until_ready(frames)
    vm = run_chunk(vm, *frames)             # warmup / compile
    float(vm.data[0, 0])                     # force full sync

    reps = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        vm = run_chunk(vm, *frames)
        # host readback of ONE element: real sync on the async tunnel
        # without dispatching extra work (a full reshape readback would
        # copy the whole 3 GB map)
        float(vm.data[0, 0])
        reps.append(FRAMES / (time.perf_counter() - t0))
    # median of REPEATS in one process: robust to tunnel noise
    return float(np.median(reps))


def measure_torch_cpu():
    import torch
    from benchmarks import torch_baseline as tb

    torch.set_num_threads(os.cpu_count() or 8)
    state = tb.make_state(MAP_H, MAP_W, MAP_D, NUM_CLASSES,
                          camera=CAMERA)
    rng = np.random.RandomState(0)
    frames = [tb.random_frame(rng, CAMERA, NUM_CLASSES)
              for _ in range(BASELINE_FRAMES + 1)]
    tb.update(state, *frames[0])  # warmup / allocations
    times = []
    for f in frames[1:]:
        t0 = time.perf_counter()
        tb.update(state, *f)
        times.append(time.perf_counter() - t0)
    # median per-frame time: robust to host load spikes
    return 1.0 / float(np.median(times))


def _tunnel_alive(port: int = 8113, timeout_s: float = 5.0) -> bool:
    """The axon TPU relay serves on local ports; jax backend init HANGS
    indefinitely when the relay is down, so probe the socket first and
    fail fast with a readable error instead."""
    import socket
    try:
        with socket.create_connection(("127.0.0.1", port), timeout_s):
            return True
    except OSError:
        return False


def _axon_plugin_present() -> bool:
    # The axon plugin ignores the JAX_PLATFORMS env var (setting it to
    # "cpu" does NOT deselect the plugin — see CLAUDE.md), so the env
    # var cannot be used to decide whether backend init will touch the
    # tunnel.  Probe whenever the plugin site dir is importable.
    import importlib.util
    return importlib.util.find_spec("axon") is not None


def _wait_for_tunnel(retries: int = 3, backoff_s: float = 60.0) -> bool:
    """Bounded retry so one transient relay outage doesn't zero a whole
    round's perf evidence (BENCH_r02 lost its number to a bad minute)."""
    import sys
    if _tunnel_alive():
        return True
    for i in range(retries):
        print(f"bench: axon relay down, retry {i + 1}/{retries} "
              f"in {backoff_s:.0f}s", file=sys.stderr)
        time.sleep(backoff_s)
        if _tunnel_alive():
            return True
    return False


def main():
    global FRAMES
    assert BATCH <= 1 or FRAMES % BATCH == 0, (
        f"BENCH_BATCH={BATCH} must divide BENCH_FRAMES={FRAMES} "
        f"(frames are folded into equal per-launch groups)")
    platform = None
    if _axon_plugin_present() and not _wait_for_tunnel():
        # honest fallback: run the SAME jitted pipeline on the host CPU
        # (forced before any backend touch — the env var cannot deselect
        # the plugin, jax.config can) so a dead relay still yields a
        # real measured number instead of a lost round (BENCH_r02).
        import sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu-fallback (axon relay down, retried 3x60s)"
        FRAMES = min(FRAMES, int(os.environ.get(
            "BENCH_FALLBACK_FRAMES", "8")))
        if BATCH > 1:
            # keep the frame count a whole number of per-launch groups
            # (the batched path reshapes into [-1, BATCH] groups)
            FRAMES = max(BATCH, FRAMES - FRAMES % BATCH)
        print("bench: falling back to CPU measurement", file=sys.stderr)
    tpu_fps = measure_tpu()
    if platform is None:
        # label with the backend that actually ran (if the axon plugin
        # is absent, jax silently defaults to CPU — never report that
        # as an on-chip number)
        import jax
        backend = jax.default_backend()
        platform = "tpu" if backend in ("tpu", "axon") else backend
    degraded = platform.startswith("cpu")
    cpu_fps = measure_torch_cpu()
    out = {
        "metric": "semantic voxel-map update throughput "
                  "(224x224 RGB-D -> 384x384x96x54)",
        "value": round(tpu_fps, 2),
        "unit": "frames/sec",
        # headline ratio uses the PINNED idle-box baseline so it is
        # reproducible across driver runs regardless of what else the
        # box is doing that minute; the live torch measurement and the
        # host context ship alongside for auditability
        "vs_baseline": round(tpu_fps / BASELINE_IDLE_FPS, 2),
        "vs_baseline_live": round(tpu_fps / cpu_fps, 2),
        "baseline_fps": round(cpu_fps, 3),
        "baseline_idle_fps": BASELINE_IDLE_FPS,
        "host": {"cpu_count": os.cpu_count(),
                 "load_1m": round(os.getloadavg()[0], 2)},
        "platform": platform,
        # default vs highest differ 1.65x on chip — a record without
        # the mode is ambiguous (docs/performance.md)
        "precision": PRECISION,
        "repeats": REPEATS,
    }
    if degraded:
        # the XLA fallback pays a full-map multiplier pass per frame
        # (1.6e9 elements) that the TPU kernel fuses; the recorded
        # on-chip number is the meaningful one
        out["note"] = ("degraded-mode measurement; last recorded "
                       "on-chip result: ~207 fps median-of-3 "
                       "(round 4, default precision)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
