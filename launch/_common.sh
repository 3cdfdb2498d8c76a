#!/bin/bash
# Shared launcher helpers. Two launch modes mirror the reference's
# MPI/SLURM split (`train_masked_fsdp.py:651-702`), re-targeted at TPU:
#
#  tpu_vm_run <config> [args...]  — Cloud TPU pod slice: run the same
#      command on every worker; jax.distributed.initialize() discovers
#      coordinates from the TPU runtime (no MASTER_ADDR dance, no NCCL).
#  slurm_run <config> [args...]   — SLURM cluster (e.g. TPU-attached or CPU
#      smoke runs): one task per host; the trainer reads SLURM_NTASKS /
#      SLURM_PROCID itself (ucf_vit_tpu/train.py init_distributed).
set -euo pipefail

tpu_vm_run() {
  local config="$1"; shift
  : "${TPU_NAME:?set TPU_NAME to the tpu-vm instance name}"
  gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --command="
    cd ucf_vit_tpu && \
    python -m ucf_vit_tpu.train $config $*
  "
}

slurm_run() {
  local config="$1"; shift
  export PYTHONPATH="$PWD:${PYTHONPATH:-}"
  time srun -n "${SLURM_NTASKS:?run under sbatch/srun}" \
    python -m ucf_vit_tpu.train "$config" SLURM "$@"
}

apptainer_run() {
  # Containerized SLURM launch (analog of the reference's *_apptainer.sh,
  # e.g. `launch/imagenet/masked_simple_apptainer.sh`): one container per
  # task, /dev bound so libtpu sees the accel devices on TPU-attached nodes.
  # Build the image first: apptainer build ucfvit-tpu.sif apptainer/tpu-vm-ucfvit.def
  local config="$1"; shift
  : "${SIF:=ucfvit-tpu.sif}"
  time srun -n "${SLURM_NTASKS:?run under sbatch/srun}" \
    apptainer exec --bind /dev "$SIF" \
    python -m ucf_vit_tpu.train "$config" SLURM "$@"
}
