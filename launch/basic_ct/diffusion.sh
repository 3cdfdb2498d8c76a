#!/bin/bash
# basic_ct diffusion: configs/basic_ct/diffusion/base_config.yaml
# TPU analog of the reference launch/basic_ct scripts — same workload, same
# config surface; `MODE=slurm` switches to an srun launch (one task/host).
source "$(dirname "$0")/../_common.sh"
CONFIG=configs/basic_ct/diffusion/base_config.yaml
if [ "${MODE:-tpu}" = slurm ]; then
  slurm_run "$CONFIG" "$@"
else
  tpu_vm_run "$CONFIG" "$@"
fi
