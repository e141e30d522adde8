#!/bin/bash
# Sweep driver: models x user-configs (the reference's wifi_csi/run.sh:1-35
# loop, without the conda plumbing).
set -euo pipefail

MODELS=${MODELS:-"MLP LSTM CNN-1D CNN-2D CLSTM ABLSTM THAT DETR"}
USER_SETS=${USER_SETS:-"0,1,2,3,4,5"}
TASK=${TASK:-activity}

for model in $MODELS; do
  for users in $USER_SETS; do
    echo "=== $model users=$users ==="
    python -m multi_modal_csi_tpu.cli.run_csi \
        --model "$model" --task "$TASK" --users "$users" \
        --set "path.save=results/result_${model}_${users//,/}.json"
  done
done
