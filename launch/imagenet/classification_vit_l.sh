#!/bin/bash
# imagenet classification, ViT-L/16 scale-out variant:
# configs/imagenet/classification_vit_l/base_config.yaml (fsdp 8 x ddp 4,
# bf16, remat, scan_layers — beyond the reference's ViT-B-only configs).
source "$(dirname "$0")/../_common.sh"
CONFIG=configs/imagenet/classification_vit_l/base_config.yaml
if [ "${MODE:-tpu}" = slurm ]; then
  slurm_run "$CONFIG" "$@"
else
  tpu_vm_run "$CONFIG" "$@"
fi
