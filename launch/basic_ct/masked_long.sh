#!/bin/bash
# basic_ct long-context 3D MAE: configs/basic_ct/mae_long/base_config.yaml
# (128^3 volumes, 32k-token decoder, seq_par_size 4 + sp_mode ring).
# Needs an 8-chip slice (fsdp 2 x sp 4), e.g. v4-16 / v5e-8:
#   TPU_NAME=my-pod launch/basic_ct/masked_long.sh
source "$(dirname "$0")/../_common.sh"
CONFIG=configs/basic_ct/mae_long/base_config.yaml
if [ "${MODE:-tpu}" = slurm ]; then
  slurm_run "$CONFIG" "$@"
else
  tpu_vm_run "$CONFIG" "$@"
fi
