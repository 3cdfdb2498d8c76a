#!/bin/bash
# End-to-end multi-host TPU pod quickstart (the reference's launch/ scripts
# target SLURM+mpirun on Frontier; this is the Cloud TPU equivalent).
#
#   1. create a pod slice (here v4-32 = 4 hosts x 4 chips):
#        gcloud compute tpus tpu-vm create $TPU_NAME \
#          --zone=$ZONE --accelerator-type=v4-32 --version=tpu-ubuntu2204-base
#   2. push the code + install on every worker:
#        gcloud compute tpus tpu-vm scp --recurse . $TPU_NAME:ucf_vit_tpu \
#          --worker=all --zone=$ZONE
#        gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --zone=$ZONE \
#          --command='pip install -e ucf_vit_tpu'
#   3. run this script: the SAME command runs on every worker;
#      jax.distributed.initialize() discovers coordinator/rank from the TPU
#      runtime (ucf_vit_tpu/train.py init_distributed) — no MASTER_ADDR,
#      no NCCL, no per-rank script arguments.
set -euo pipefail
: "${TPU_NAME:?set TPU_NAME}"
: "${ZONE:?set ZONE}"
CONFIG="${CONFIG:-configs/imagenet/classification/base_config.yaml}"
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --zone="$ZONE" \
  --command="cd ucf_vit_tpu && python -m ucf_vit_tpu.train $CONFIG $*"
