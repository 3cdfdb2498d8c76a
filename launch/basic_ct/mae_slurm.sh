#!/bin/bash
#SBATCH -J mae_basic_ct
#SBATCH -N 4
#SBATCH --ntasks-per-node=1
#SBATCH -t 02:00:00
# MAE pretrain on basic_ct under SLURM (one process per host;
# jax.distributed.initialize reads SLURM_* for rendezvous).
srun python -m ucf_vit_tpu.train configs/basic_ct/mae/base_config.yaml SLURM
