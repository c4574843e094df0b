#!/bin/sh
# Chained after experiments/mr22/queue_r5.sh: regenerate the
# feature-matching mechanism arms at HEAD, n=32 matched seeds.
set -x
cd /root/repo
R=experiments/fm
if [ ! -d /tmp/backbone-rand ]; then
  python -c "
from mass_tpu.perception.resnet import init_backbone
from mass_tpu.utils.checkpoint import save_pytree
save_pytree('/tmp/backbone-rand', init_backbone())"
fi
sh $R/run_arm.sh $R/fm-size 32 >> $R/fm-size.log 2>&1
sh $R/run_arm.sh $R/fm-features 32 --use-feature-matching \
    --backbone-checkpoint /tmp/backbone-rand >> $R/fm-features.log 2>&1
echo FM_QUEUE_DONE
