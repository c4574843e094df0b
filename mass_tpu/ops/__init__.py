from mass_tpu.ops.scatter import (  # noqa: F401
    corner_contributions, apply_onehot_cmajor, apply_onehot_vmajor,
    apply_dense_rows)
