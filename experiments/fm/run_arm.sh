#!/bin/sh
# Frozen duplicate-pairs feature-matching protocol (round-5 frozen
# version of the round-3 mechanism isolation, docs/experiments.md
# "Feature matching"): 6 m single-room scenes whose ONLY difference is
# one same-class same-size tinted pair with one member misplaced; size
# matching is ambiguous by construction.  Both arms share everything
# but the matcher, so the comparison is nav-regime-proof; regenerated
# at HEAD because the round-3 arms predate collision-evidence nav.
#
# Usage: sh experiments/fm/run_arm.sh <logdir> <n_tasks> [extra flags]
LOGDIR="$1"; N="$2"; shift 2
exec python -m mass_tpu.agent.cli --backend gridworld --platform cpu \
  --camera-size 48 --map-height 80 --map-width 80 --map-depth 24 \
  --grid-resolution 0.125 --step-size 2 --obstacle-padding 2 \
  --map-slice-start 0 --map-slice-stop 12 \
  --room-size 6 --num-objects 1 --num-misplaced 0 --num-opened 0 \
  --duplicate-class-pairs 1 \
  --exploration-budget-one 3 --exploration-budget-two 2 \
  --max-goal-steps 60 --max-steps 500 --ground-truth-segmentation \
  --ground-truth-disagreement --ground-truth-semantic-search \
  --resume --start-task 0 --total-tasks "$N" --logdir "$LOGDIR" "$@"
