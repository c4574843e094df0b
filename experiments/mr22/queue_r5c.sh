#!/bin/sh
# Reordered round-5 remainder (verdict item 2 first): 2x2 ingredient
# cells + inhibition radius sweep at n=64, then the frontier row, then
# n=128 extensions as time allows.
set -x
cd /root/repo
R=experiments/mr22
run() { sh $R/run_arm.sh "$@" ; }
run $R/cond-iid 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    >> $R/cond-iid.log 2>&1
run $R/plain-iid 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-multiroom \
    >> $R/plain-iid.log 2>&1
run $R/cond-ihr-r4 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    --policy-inhibition-radius 4 >> $R/cond-ihr-r4.log 2>&1
run $R/cond-ihr-r16 64 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-conditioned-multiroom \
    --policy-inhibition-radius 16 >> $R/cond-ihr-r16.log 2>&1
run $R/frontier 64 --frontier-exploration >> $R/frontier.log 2>&1
run $R/plain-ihr 128 --frontier-exploration --semantic-search-unshuffle \
    --policy-checkpoint checkpoints/policy-multiroom \
    --policy-inhibition-radius 8 >> $R/plain-ihr.log 2>&1
run $R/gt 128 --ground-truth-semantic-search >> $R/gt.log 2>&1
run $R/frontier 128 --frontier-exploration >> $R/frontier.log 2>&1
echo QUEUE_DONE
