from mass_tpu.core.voxelmap import VoxelMap  # noqa: F401
