from mass_tpu.ops.scatter import (  # noqa: F401
    corner_contributions, apply_onehot_cmajor, apply_dense_rows)
