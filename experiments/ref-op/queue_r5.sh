#!/bin/sh
# Reference-operating-point arms on the TPU chip (VERDICT r4 item 4),
# cap-500 protocol, blocks of 4 tasks round-robin so a wall-clock
# cutoff still leaves matched seeds across all arms.
set -x
cd /root/repo
R=experiments/ref-op
for N in 4 8 12 16 20 24 28 32; do
  sh $R/run_arm.sh $R/random $N >> $R/random.log 2>&1
  sh $R/run_arm.sh $R/revisit $N --frontier-exploration \
      --revisit-exploration >> $R/revisit.log 2>&1
  sh $R/run_arm.sh $R/cond-ihr $N --frontier-exploration \
      --semantic-search-unshuffle \
      --policy-checkpoint checkpoints/policy-conditioned-multiroom \
      --policy-inhibition-radius 20 >> $R/cond-ihr.log 2>&1
done
echo REFOP_QUEUE_DONE
