"""mass_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
3D semantic mapping & semantic-search room rearrangement.

This is a ground-up TPU-first rebuild of the capabilities of the MaSS
reference ("A Simple Approach for Visual Room Rearrangement: 3D Mapping
and Semantic Search", ICLR 2023).  The compute core — depth unprojection,
trilinear voxel scatter, top-down rendering, map differencing, instance
matching — runs as jitted XLA (with Pallas kernels for the hot paths) and
shards over `jax.sharding.Mesh` device meshes; the (host-side, sequential)
simulator is isolated behind an environment protocol with a recorded /
procedural replacement for simulator-free operation.

Layout:
    core/       pure geometry + voxel-map state and its functional updates
    ops/        scatter / pooling / connected-components / assignment ops
    maps/       occupancy, semantic, feature (resnet), clip map variants
    perception/ segmentation (GT lookup + detector interface), backbones
    search/     semantic-search goal policy (model, sampling, training)
    match/      map differencing + cross-phase instance matching
    nav/        traversability, nav-grid planning, local controller
    env/        environment protocol, procedural grid world, THOR gateway
    agent/      episode driver, metrics, reliability, CLI
    parallel/   mesh / sharding helpers for multi-chip execution
    utils/      visualization, profiling, checkpointing
"""

__version__ = "0.1.0"

from mass_tpu.config import (  # noqa: F401
    CameraConfig,
    MapGeometry,
)
from mass_tpu.core.voxelmap import VoxelMap  # noqa: F401
