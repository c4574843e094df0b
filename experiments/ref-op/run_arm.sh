#!/bin/sh
# Reference-operating-point protocol (VERDICT r4 item 4): the
# reference's own defaults — camera 224, map 384x384x96 @ 0.05 m,
# exploration budgets 5+5 (/root/reference/agent.py:817-839) — on the
# multi-room regime (12 m x 3 rooms, 5 objects / 2 misplaced), GT
# segmentation + disagreement, matched seeds 0..N-1.  Runs on the TPU
# chip (default platform); nav invariants: step 5 x 0.05 = 0.25 m,
# padding 4 x 0.05 = 0.2 m, slice 20-48 covers the floor band.
#
# Per-phase step cap 500: at the 250 default, budget 5+5 burns the
# whole unshuffle phase on exploration goals and every head collapses
# (random 0.12, revisit 0.04 at n=8 — kept as *-cap250/); the
# reference's THOR envelope separates exploration from the phase
# cap, so the gridworld stand-in needs headroom for the fixing leg.
# Usage: sh experiments/ref-op/run_arm.sh <logdir> <n_tasks> [flags...]
LOGDIR="$1"; N="$2"; shift 2
exec python -m mass_tpu.agent.cli --backend gridworld \
  --camera-size 224 --map-height 384 --map-width 384 --map-depth 96 \
  --grid-resolution 0.05 --step-size 5 --obstacle-padding 4 \
  --map-slice-start 20 --map-slice-stop 48 \
  --room-size 12 --num-rooms 3 --num-objects 5 --num-misplaced 2 \
  --exploration-budget-one 5 --exploration-budget-two 5 \
  --max-goal-steps 60 --max-steps 500 --ground-truth-segmentation \
  --ground-truth-disagreement --record-found-objects \
  --resume --start-task 0 --total-tasks "$N" --logdir "$LOGDIR" "$@"
