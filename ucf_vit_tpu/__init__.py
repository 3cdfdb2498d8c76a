"""UCF-VIT-TPU: a TPU-native vision-transformer training framework.

Re-designed from scratch for JAX/XLA/Pallas/GSPMD with the capabilities of the
reference UCF-VIT (PyTorch/NCCL) framework:

- Five architectures sharing one ViT encoder: VIT, MAE, UNETR, SAP, DiffusionVIT.
- Hybrid parallelism (DP x FSDP x TP x SP) expressed as ONE jax.sharding.Mesh with
  named-axis sharding rules instead of six NCCL process groups.
- Adaptive patching (quadtree/octree) on the host data path.
- Pallas flash-attention kernels on the device compute path.
"""

__version__ = "0.1.0"
