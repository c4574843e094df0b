from mass_tpu.ops.scatter import trilinear_scatter_update  # noqa: F401
