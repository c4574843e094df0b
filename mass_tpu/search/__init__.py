from mass_tpu.search.policy import (  # noqa: F401
    SearchPolicy, sample_goal_cell, goal_logits)
