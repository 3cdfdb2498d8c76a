"""Mixture-of-Experts MLP with expert parallelism over the 'ep' mesh axis.

Capability-plus over the reference, which has no MoE and no expert
parallelism at all (SURVEY.md §2.5: "PP / EP / CP — absent entirely";
its MLP is the dense two-layer block at
`/root/reference/src/UCF_VIT/simple/building_blocks.py:94-129`). This is the
V-MoE recipe (Riquelme et al. 2021, "Scaling Vision with Sparse Mixture of
Experts") applied to the same ViT blocks: replace the dense MLP in a subset
of blocks with E expert MLPs and a learned top-k token router, growing
parameter count ~E× at near-constant per-token FLOPs.

TPU-native formulation (the GShard/Mesh-TF einsum algorithm, the shape XLA's
SPMD partitioner was built around — no torch-style gather/scatter):

- Expert weights are STACKED params `[E, ...]` whose leading axis carries the
  logical name "expert" -> mesh axis 'ep' (parallel/mesh.py LOGICAL_RULES),
  so each device holds E/ep experts and there is no weight movement.
- Routing is expressed as two dense one-hot tensors, `dispatch [B,N,E,C]`
  and `combine [B,N,E,C]` (C = per-sample expert capacity). Token movement
  is then just einsums: with tokens sharded batch-wise over (ddp,ep,fsdp)
  and experts sharded over ep, GSPMD lowers the dispatch/return einsums to
  the canonical all-to-all pair over the ep axis automatically — the manual
  a2a choreography of NCCL MoE stacks (Tutel/DeepSpeed-MoE) disappears into
  sharding annotations.
- Static shapes everywhere: capacity C is a compile-time constant, overflow
  tokens are dropped (their block output is the residual alone), so the
  whole thing jits once — no dynamic shapes, no host sync.

Load-balancing auxiliary loss (Shazeer/Switch form) is emitted through a
dedicated "moe" sow collection; the task loss functions (tasks.py `_apply`)
collect and weight it. Router math runs in float32 regardless of the bf16
compute policy (router logits are famously precision-sensitive).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ucf_vit_tpu.parallel.mesh import logical_constraint

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
zeros_init = nn.initializers.zeros


def expert_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Per-sample per-expert slot count: ceil(k*N/E) scaled by the factor.
    capacity_factor >= E/ (k) * ... note: >= E/k * 1 guarantees zero drops
    only for a perfectly uniform router; 1.25 is the V-MoE/GShard default."""
    cap = int(np.ceil(top_k * num_tokens * capacity_factor / num_experts))
    return max(cap, 1)


class MoeMlp(nn.Module):
    """Top-k routed mixture-of-experts MLP (drop-in for blocks.Mlp).

    Input/output: [B, N, D]. Each sample's N tokens are routed independently
    (groups == samples, the V-MoE arrangement) so routing never mixes
    information across the batch and per-sample capacity is deterministic.
    """

    dim: int
    hidden_features: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    renorm_gates: bool = True  # normalize the k selected gates to sum to 1
    gelu_approx: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        del deterministic  # routing is deterministic; no in-MLP dropout
        b, n, d = x.shape
        e = self.num_experts
        k = min(self.top_k, e)
        c = expert_capacity(n, e, k, self.capacity_factor)

        # ---- router (float32: softmax over experts is precision-sensitive)
        router_kernel = self.param(
            "router_kernel",
            nn.with_partitioning(trunc_normal_init, ("embed", None)),
            (d, e),
            jnp.float32,
        )
        logits = jnp.einsum(
            "bnd,de->bne", x.astype(jnp.float32), router_kernel
        )
        probs = jax.nn.softmax(logits, axis=-1)  # [B,N,E] f32

        gates, expert_idx = jax.lax.top_k(probs, k)  # [B,N,k]
        if self.renorm_gates and k > 1:
            gates = gates / jnp.maximum(
                jnp.sum(gates, axis=-1, keepdims=True), 1e-9
            )

        # ---- capacity assignment: k priority rounds, sequence-order priority
        # within each round (the Mesh-TF top-2 gating algorithm)
        counts = jnp.zeros((b, e), jnp.float32)  # committed slots per expert
        dispatch = jnp.zeros((b, n, e, c), jnp.float32)
        combine = jnp.zeros((b, n, e, c), jnp.float32)
        for kk in range(k):
            onehot = jax.nn.one_hot(expert_idx[..., kk], e, dtype=jnp.float32)
            # queue position of each token in its chosen expert: earlier
            # tokens of this round + everything committed in earlier rounds
            pos = jnp.cumsum(onehot, axis=1) - onehot + counts[:, None, :]
            keep = onehot * (pos < c)  # [B,N,E]
            counts = counts + jnp.sum(keep, axis=1)
            slot = jax.nn.one_hot(
                jnp.sum(pos * onehot, axis=-1).astype(jnp.int32), c,
                dtype=jnp.float32,
            )  # [B,N,C] — slot index of this token (garbage where dropped)
            sel = keep[..., None] * slot[:, :, None, :]  # [B,N,E,C]
            dispatch = dispatch + sel
            combine = combine + gates[..., kk, None, None] * sel

        # ---- load-balance auxiliary loss (Switch Transformer eq. 4):
        # E * sum_e( fraction_of_tokens_routed_to_e * mean_router_prob_e ),
        # computed from the top-1 assignment, minimized == uniform routing.
        top1 = jax.nn.one_hot(expert_idx[..., 0], e, dtype=jnp.float32)
        f_e = jnp.mean(top1, axis=(0, 1))  # [E]
        p_e = jnp.mean(probs, axis=(0, 1))  # [E]
        aux = e * jnp.sum(f_e * p_e)
        self.sow("moe", "aux_loss", aux)

        # ---- expert FFN on dispatched slots (stacked weights, 'ep'-sharded)
        wi = self.param(
            "wi",
            nn.with_partitioning(trunc_normal_init, ("expert", "embed", "mlp")),
            (e, d, self.hidden_features),
        )
        bi = self.param(
            "bi",
            nn.with_partitioning(zeros_init, ("expert", "mlp")),
            (e, self.hidden_features),
        )
        wo = self.param(
            "wo",
            nn.with_partitioning(trunc_normal_init, ("expert", "mlp", "embed")),
            (e, self.hidden_features, d),
        )
        bo = self.param(
            "bo",
            nn.with_partitioning(zeros_init, ("expert", "embed")),
            (e, d),
        )

        cdt = self.dtype or x.dtype
        # Dispatch in dot-NATURAL output order (batch dim b leads: becd) and
        # reshard there — moving the ep mesh axis from b to e on an
        # untransposed tensor is the canonical all-to-all GSPMD knows how to
        # lower. Emitting "->ebcd" directly fuses a transpose into the einsum
        # and the partitioner then gives up with an involuntary full
        # rematerialization (replicate-then-repartition) — observed in the
        # round-3 8-device dryrun (MULTICHIP_r03.json); tests/test_spmd_resharding.py
        # guards the fix.
        xe = jnp.einsum("bnec,bnd->becd", dispatch.astype(cdt), x.astype(cdt))
        xe = logical_constraint(xe, ("expert_batch", "expert", None, None))
        # pure transpose: shardings permute with the dims, no data movement
        xe = jnp.transpose(xe, (1, 0, 2, 3))
        xe = logical_constraint(xe, ("expert", "expert_batch", None, None))
        h = jnp.einsum("ebcd,edh->ebch", xe, wi.astype(cdt)) + bi.astype(cdt)[
            :, None, None, :
        ]
        h = nn.gelu(h, approximate=self.gelu_approx)
        ye = jnp.einsum("ebch,ehd->ebcd", h, wo.astype(cdt)) + bo.astype(cdt)[
            :, None, None, :
        ]
        ye = logical_constraint(ye, ("expert", "expert_batch", None, None))
        # return trip mirrors the dispatch: transpose back to batch-leading
        # (local), reshard e->replicated / b->(ddp,ep,fsdp) as the a2a, THEN
        # the combine einsum runs fully batch-parallel with no hidden reshard
        yb = jnp.transpose(ye, (1, 0, 2, 3))  # [B,E,C,D]
        yb = logical_constraint(yb, ("expert_batch", "expert", None, None))
        yb = logical_constraint(yb, ("batch", None, None, None))
        y = jnp.einsum("becd,bnec->bnd", yb, combine.astype(cdt))
        y = logical_constraint(y, ("batch", None, None))
        return y.astype(x.dtype)


def collect_moe_aux(mutables) -> jnp.ndarray:
    """Mean of every sow'd MoE aux loss in an `apply(..., mutable='moe')`
    result — one scalar regardless of how many MoE layers (stacked arrays
    under nn.scan, tuples from sow) contributed."""
    leaves = jax.tree.leaves(mutables.get("moe", {}))
    if not leaves:
        return jnp.float32(0.0)
    total = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    count = sum(int(np.prod(l.shape)) if l.ndim else 1 for l in leaves)
    return total / max(count, 1)
