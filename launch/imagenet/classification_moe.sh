#!/bin/bash
# imagenet classification, MoE variant (capability-plus; the reference has
# no MoE): configs/imagenet/classification_moe/base_config.yaml — ViT-B/16
# with an 8-expert top-2 routed MLP every 2nd block, experts sharded over
# the `ep` mesh axis (models/moe.py). 555 img/s/chip at 60.3% self-MFU on
# one v5e chip (BASELINE.md).
source "$(dirname "$0")/../_common.sh"
CONFIG=configs/imagenet/classification_moe/base_config.yaml
if [ "${MODE:-tpu}" = slurm ]; then
  slurm_run "$CONFIG" "$@"
else
  tpu_vm_run "$CONFIG" "$@"
fi
