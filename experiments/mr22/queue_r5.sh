#!/bin/sh
# Round-5 regeneration queue (VERDICT item 1): every published arm
# regenerated AT HEAD via the frozen protocol, n=128, raw results
# committed.  Order = flagship claims first so an early cutoff still
# yields the paired headline table.  Runs sequentially on the 1-core
# host; each step resumes, so re-running the queue is idempotent.
set -x
cd /root/repo
R=experiments/mr22
run() { sh $R/run_arm.sh "$@" ; }

# 1) revisit to 64 (head table needs it at HEAD)
run $R/revisit 64 --frontier-exploration --revisit-exploration \
    >> $R/revisit.log 2>&1
# 2-4) flagship pairs to n=128
run $R/random 128 >> $R/random.log 2>&1
run $R/cond-ihr 128 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    --policy-inhibition-radius 8 >> $R/cond-ihr.log 2>&1
run $R/revisit 128 --frontier-exploration --revisit-exploration \
    >> $R/revisit.log 2>&1
# 5) GT ceiling
run $R/gt 64 --ground-truth-semantic-search >> $R/gt.log 2>&1
# 6) decode-rule control to 128
run $R/plain-ihr 128 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-multiroom \
    --policy-inhibition-radius 8 >> $R/plain-ihr.log 2>&1
# 7-9) remaining arms
run $R/frontier 64 --frontier-exploration >> $R/frontier.log 2>&1
run $R/gt 128 --ground-truth-semantic-search >> $R/gt.log 2>&1
run $R/frontier 128 --frontier-exploration >> $R/frontier.log 2>&1
# 10) 2x2 ingredient cells (context x decode), frontier walkthrough
#     everywhere so the decode/context axes are the ONLY differences
run $R/cond-iid 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    >> $R/cond-iid.log 2>&1
run $R/plain-iid 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-multiroom \
    >> $R/plain-iid.log 2>&1
# 11) inhibition radius sweep (VERDICT item 2), cond head, n=64
run $R/cond-ihr-r4 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    --policy-inhibition-radius 4 >> $R/cond-ihr-r4.log 2>&1
run $R/cond-ihr-r16 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    --policy-inhibition-radius 16 >> $R/cond-ihr-r16.log 2>&1
echo QUEUE_DONE
