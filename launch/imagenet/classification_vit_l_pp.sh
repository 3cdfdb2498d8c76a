#!/bin/bash
# imagenet classification, ViT-L/16 pipeline-parallel variant (capability-
# plus; the reference has no PP): configs/imagenet/classification_vit_l_pp/
# base_config.yaml — GPipe over the `pp` mesh axis (parallel/pipeline.py),
# scan-stacked block params sharded per stage, activations hop stages by
# neighbor-only ppermute.
source "$(dirname "$0")/../_common.sh"
CONFIG=configs/imagenet/classification_vit_l_pp/base_config.yaml
if [ "${MODE:-tpu}" = slurm ]; then
  slurm_run "$CONFIG" "$@"
else
  tpu_vm_run "$CONFIG" "$@"
fi
