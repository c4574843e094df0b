#!/bin/sh
# Reference-operating-point arms on the TPU chip (VERDICT r4 item 4):
# random / revisit / conditioned+inhibition at the reference defaults
# (camera 224, 384x384x96 @ 0.05 m, budgets 5+5).  ~305 s/task
# (measured probe) — run ROUND-ROBIN in blocks of 8 tasks so a
# wall-clock cutoff still leaves matched seeds across all arms.
# Inhibition radius scales with resolution: 20 cells @ 0.05 m = 1 m
# (= 8 cells @ 0.125 m in the sweep protocol).
set -x
cd /root/repo
R=experiments/ref-op
for N in 8 16 24 32; do
  sh $R/run_arm.sh $R/random $N >> $R/random.log 2>&1
  sh $R/run_arm.sh $R/revisit $N --frontier-exploration \
      --revisit-exploration >> $R/revisit.log 2>&1
  sh $R/run_arm.sh $R/cond-ihr $N --frontier-exploration \
      --semantic-search-unshuffle \
      --policy-checkpoint checkpoints/policy-conditioned-multiroom \
      --policy-inhibition-radius 20 >> $R/cond-ihr.log 2>&1
done
echo REFOP_QUEUE_DONE
