#!/bin/bash
# ViT-B/16 ImageNet classification on a TPU v4-32 pod slice.
# (Replaces the reference's SLURM/mpirun scripts, launch/imagenet/*.sh —
# on Cloud TPU each worker runs the same command; jax.distributed discovers
# coordinates from the TPU runtime.)
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --command="
  cd ucf_vit_tpu && \
  python -m ucf_vit_tpu.train configs/imagenet/classification/base_config.yaml
"
