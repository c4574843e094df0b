"""Direct parity against the torch implementation of the reference
pipeline (benchmarks/torch_baseline.py) — the BASELINE.json north star:
voxel semantics agreeing within 1e-3."""

import numpy as np
import jax.numpy as jnp
import pytest

from mass_tpu.config import MapGeometry
from mass_tpu.core import geometry as G
from mass_tpu.core.voxelmap import VoxelMap


@pytest.mark.parametrize("use_kernel", [False, True])
def test_voxel_update_matches_torch_pipeline(use_kernel):
    import torch
    from benchmarks import torch_baseline as tb

    h_img = w_img = 24
    # the Pallas kernel needs cmajor storage; the XLA variant runs on
    # "auto" (vmajor on the CPU test backend) so torch parity covers
    # both host layouts across the parametrization
    geo = MapGeometry(map_height=32, map_width=16, map_depth=4,
                      feature_size=6, grid_resolution=0.2,
                      layout="cmajor" if use_kernel else "auto")
    state = tb.make_state(geo.map_height, geo.map_width, geo.map_depth,
                          geo.feature_size,
                          grid_resolution=geo.grid_resolution,
                          camera=h_img, vfov=90.0)

    vm = VoxelMap.create(geo, (0.0, 0.0, 0.0))
    import math
    focal = h_img / 2.0 / math.tan(math.radians(90.0) / 2.0)
    rays = G.camera_rays(h_img, w_img, focal, focal)

    rng = np.random.RandomState(0)
    for step in range(3):
        depth = rng.uniform(0.1, 2.5, (h_img, w_img, 1)).astype(
            np.float32)
        classes = rng.randint(0, geo.feature_size,
                              (h_img, w_img)).astype(np.int32)
        onehot = np.eye(geo.feature_size, dtype=np.float32)[classes]
        pos = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
        yaw = float(rng.uniform(-np.pi, np.pi))
        elev = float(rng.uniform(-0.5, 0.1))

        tb.update(state, torch.from_numpy(depth),
                  torch.from_numpy(onehot), pos, yaw, elev)
        vm = vm.update_classes(rays, jnp.asarray(pos),
                               jnp.float32(yaw), jnp.float32(elev),
                               jnp.asarray(depth), jnp.asarray(classes),
                               use_kernel=use_kernel)

    torch_grid = state["data"].numpy()
    assert np.abs(torch_grid).sum() > 0
    np.testing.assert_allclose(np.asarray(vm.grid()), torch_grid,
                               atol=1e-3)
    # and the agreement is actually much tighter
    assert np.abs(np.asarray(vm.grid()) - torch_grid).max() < 2e-4
