"""Ring attention: sequence-parallel attention with rotating KV chunks.

True long-context sequence parallelism (capability-plus over the reference,
whose `seq_par_size` is declared but asserted ==1, reference
`train_masked_fsdp.py:220`): each sp shard holds N/sp queries AND N/sp
keys/values; KV chunks rotate around the ring via `lax.ppermute` while an
online-softmax accumulator combines partial results.

Memory is O(N/sp) per chip in BOTH directions: the forward saves only the
per-row log-sum-exp (not per-chunk probabilities), and the custom VJP
recomputes each chunk's probabilities from (q, k_chunk, lse) during a second
ring pass — the flash-attention backward recipe, expressed with jnp ops +
ppermute instead of a Pallas kernel because the inter-chip ring IS the outer
loop; each chunk-pair einsum is a dense block XLA schedules well at the
block sizes sequence parallelism produces.

Attention-probability dropout (reference `attn_drop` inside its fused
kernels, `simple/building_blocks.py:163-174`) composes with the ring: the
keep mask is the same global-coordinate hash the Pallas kernel uses
(ops/attn_dropout.py) — shard i owns global query rows [i*Nq, (i+1)*Nq) and
sees the chunk that started on shard s at global columns [s*Nk, (s+1)*Nk),
so every (row, col) pair is masked exactly once, by the shard owning the
row, and the union over shards is one global Bernoulli draw. The backward
ring pass regenerates each chunk's mask from the same coordinates; nothing
is stored.

Must be called inside shard_map with `axis_name` bound. Shapes [B, H, N/sp, dh].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ucf_vit_tpu.ops.attn_dropout import dense_keep_mask


def _ring_perm(sp_size: int):
    return [(i, (i + 1) % sp_size) for i in range(sp_size)]


def _chunk_keep(seed, shape, row0, col0, rate: float):
    """[B, H, nq, nk] keep mask for one ring chunk at global (row0, col0)."""
    b_, h_, nq, nk = shape
    z = dense_keep_mask(seed, b_ * h_, nq, nk, rate, row0=row0, col0=col0)
    return z.reshape(b_, h_, nq, nk)


def _fwd_pass(q, k, v, seed, axis_name: str, sm_scale: float, dropout_rate: float):
    """Online-softmax ring forward. Returns (out f32, lse [B,H,Nq,1])."""
    sp_size = lax.psum(1, axis_name)
    perm = _ring_perm(sp_size)
    q32 = q.astype(jnp.float32) * sm_scale

    b_, h_, nq, dh = q.shape
    nk = k.shape[2]
    acc = jnp.zeros((b_, h_, nq, dh), jnp.float32)
    m = jnp.full((b_, h_, nq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b_, h_, nq, 1), jnp.float32)
    my = lax.axis_index(axis_name)

    kc, vc = k, v
    for t in range(sp_size):  # sp_size is small and static: unrolled ring
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, kc.astype(jnp.float32))
        m_i = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_i)
        l_i = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # drop AFTER the normalizer contribution (l_i) — scaling then
            # commutes with the final acc/l division, exactly as in the
            # Pallas forward kernel
            src = (my - t) % sp_size  # home shard of the current kv chunk
            z = _chunk_keep(
                seed, (b_, h_, nq, nk), my * nq, src * nk, dropout_rate
            )
            p = jnp.where(z, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        acc_i = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vc.dtype), vc).astype(
            jnp.float32
        )
        m_new = jnp.maximum(m, m_i)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_i - m_new)
        acc = acc * a + acc_i * b
        l = l * a + l_i * b
        m = m_new
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)

    l = jnp.maximum(l, 1e-37)
    out = acc / l
    lse = m + jnp.log(l)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_core(q, k, v, seed, axis_name, sm_scale, dropout_rate):
    out, _ = _fwd_pass(q, k, v, seed, axis_name, sm_scale, dropout_rate)
    return out.astype(q.dtype)


def _ring_fwd(q, k, v, seed, axis_name, sm_scale, dropout_rate):
    out, lse = _fwd_pass(q, k, v, seed, axis_name, sm_scale, dropout_rate)
    out = out.astype(q.dtype)
    # residuals are O(N/sp): no per-chunk probability or mask tensors saved
    return out, (q, k, v, out, lse, seed)


def _ring_bwd(axis_name, sm_scale, dropout_rate, res, dout):
    q, k, v, out, lse, seed = res
    sp_size = lax.psum(1, axis_name)
    perm = _ring_perm(sp_size)

    q32 = q.astype(jnp.float32) * sm_scale
    do32 = dout.astype(jnp.float32)
    # delta_i = sum_j dout_ij * out_ij (the softmax-jacobian diagonal term;
    # with dropout, out is bilinear in the dropped probs, so this still
    # equals sum_k p_k * (dL/dp_k) — same identity the Pallas backward uses)
    delta = jnp.sum(do32 * out.astype(jnp.float32), axis=-1, keepdims=True)

    b_, h_, nq, _ = q.shape
    nk = k.shape[2]
    my = lax.axis_index(axis_name)

    dq = jnp.zeros(q.shape, jnp.float32)
    # dk/dv ride the ring WITH their k/v chunk: after sp_size hops each
    # chunk has collected contributions from every query shard and is home
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    kc, vc, dkc, dvc = k, v, dk, dv
    for t in range(sp_size):
        k32 = kc.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k32)
        p = jnp.exp(s - lse)  # recomputed PRE-dropout chunk probabilities
        dp = jnp.einsum("bhqd,bhkd->bhqk", do32, vc.astype(jnp.float32))
        if dropout_rate > 0.0:
            src = (my - t) % sp_size
            z = _chunk_keep(
                seed, (b_, h_, nq, nk), my * nq, src * nk, dropout_rate
            )
            inv_keep = 1.0 / (1.0 - dropout_rate)
            p_v = jnp.where(z, p * inv_keep, 0.0)  # post-dropout probs
            dp = jnp.where(z, dp * inv_keep, 0.0)
        else:
            p_v = p
        dvc = dvc + jnp.einsum("bhqk,bhqd->bhkd", p_v, do32)
        ds = p * (dp - delta)
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k32) * sm_scale
        # q32 already carries sm_scale: dk = ds^T . (q * scale), no extra factor
        dkc = dkc + jnp.einsum("bhqk,bhqd->bhkd", ds, q32)
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        dkc = lax.ppermute(dkc, axis_name, perm)
        dvc = lax.ppermute(dvc, axis_name, perm)

    import numpy as np

    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq.astype(q.dtype), dkc.astype(k.dtype), dvc.astype(v.dtype), dseed


_ring_core.defvjp(_ring_fwd, _ring_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    sm_scale: float | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "dropout_rate > 0 needs dropout_seed"
        seed = jnp.asarray(dropout_seed, jnp.int32)
    else:
        seed = jnp.zeros((), jnp.int32)
    return _ring_core(q, k, v, seed, axis_name, sm_scale, dropout_rate)
