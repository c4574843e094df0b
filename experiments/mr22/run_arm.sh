#!/bin/sh
# Frozen multi-room 2+2 protocol (docs/experiments.md "Multi-room
# scenes"): 12 m x 3-room scenes, map 160x160x24 @ 0.125 m, camera 48,
# 5 objects / 2 misplaced, budgets 2+2, 60 goal steps, GT segmentation
# + disagreement, matched seeds 0..N-1.  Episodes are bit-for-bit
# deterministic per task id, so arms re-run after a machine wipe
# reproduce the published per-task outcomes exactly (the determinism
# check in docs/experiments.md "n=128 extension").  Keep logdirs under
# experiments/mr22/ and COMMIT the results/ JSONs: the round-4 /tmp
# wipe cost a finished control arm.
#
# Usage: sh experiments/mr22/run_arm.sh <logdir> <n_tasks> [extra flags...]
# Arms measured so far (paired per-task via `analyze compare`):
#   random      : (no extra flags)
#   frontier    : --frontier-exploration
#   revisit     : --frontier-exploration --revisit-exploration
#   gt-search   : --ground-truth-semantic-search
#   plain CNN   : --semantic-search-walkthrough --semantic-search-unshuffle \
#                 --policy-checkpoint checkpoints/policy-multiroom
#   conditioned + inhibition (the learned win):
#                 --frontier-exploration --semantic-search-unshuffle \
#                 --policy-checkpoint checkpoints/policy-conditioned-multiroom \
#                 --policy-inhibition-radius 8
#   plain + inhibition (decode-rule control):
#                 --frontier-exploration --semantic-search-unshuffle \
#                 --policy-checkpoint checkpoints/policy-multiroom \
#                 --policy-inhibition-radius 8
LOGDIR="$1"; N="$2"; shift 2
exec python -m mass_tpu.agent.cli --backend gridworld --platform cpu \
  --camera-size 48 --map-height 160 --map-width 160 --map-depth 24 \
  --grid-resolution 0.125 --step-size 2 --obstacle-padding 2 \
  --map-slice-start 0 --map-slice-stop 12 \
  --room-size 12 --num-rooms 3 --num-objects 5 --num-misplaced 2 \
  --exploration-budget-one 2 --exploration-budget-two 2 \
  --max-goal-steps 60 --ground-truth-segmentation \
  --ground-truth-disagreement --record-found-objects \
  --resume --start-task 0 --total-tasks "$N" --logdir "$LOGDIR" "$@"
