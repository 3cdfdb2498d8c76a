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

Must be called inside shard_map with `axis_name` bound. Shapes [B, H, N/sp, dh].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _ring_perm(sp_size: int):
    return [(i, (i + 1) % sp_size) for i in range(sp_size)]


def _fwd_pass(q, k, v, axis_name: str, sm_scale: float):
    """Online-softmax ring forward. Returns (out f32, lse [B,H,Nq,1])."""
    sp_size = lax.psum(1, axis_name)
    perm = _ring_perm(sp_size)
    q32 = q.astype(jnp.float32) * sm_scale

    b_, h_, nq, dh = q.shape
    acc = jnp.zeros((b_, h_, nq, dh), jnp.float32)
    m = jnp.full((b_, h_, nq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b_, h_, nq, 1), jnp.float32)

    kc, vc = k, v
    for _ in range(sp_size):  # sp_size is small and static: unrolled ring
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, kc.astype(jnp.float32))
        m_i = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_i)
        l_i = jnp.sum(p, axis=-1, keepdims=True)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    out, _ = _fwd_pass(q, k, v, axis_name, sm_scale)
    return out.astype(q.dtype)


def _ring_fwd(q, k, v, axis_name, sm_scale):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    out, lse = _fwd_pass(q, k, v, axis_name, sm_scale)
    out = out.astype(q.dtype)
    # residuals are O(N/sp): no per-chunk probability tensors are saved
    return out, (q, k, v, out, lse)


def _ring_bwd(axis_name, sm_scale, res, dout):
    q, k, v, out, lse = res
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    sp_size = lax.psum(1, axis_name)
    perm = _ring_perm(sp_size)

    q32 = q.astype(jnp.float32) * sm_scale
    do32 = dout.astype(jnp.float32)
    # delta_i = sum_j dout_ij * out_ij (the softmax-jacobian diagonal term)
    delta = jnp.sum(do32 * out.astype(jnp.float32), axis=-1, keepdims=True)

    dq = jnp.zeros(q.shape, jnp.float32)
    # dk/dv ride the ring WITH their k/v chunk: after sp_size hops each
    # chunk has collected contributions from every query shard and is home
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    kc, vc, dkc, dvc = k, v, dk, dv
    for _ in range(sp_size):
        k32 = kc.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k32)
        p = jnp.exp(s - lse)  # recomputed chunk probabilities
        dvc = dvc + jnp.einsum("bhqk,bhqd->bhkd", p, do32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", do32, vc.astype(jnp.float32))
        ds = p * (dp - delta)
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k32) * sm_scale
        # q32 already carries sm_scale: dk = ds^T . (q * scale), no extra factor
        dkc = dkc + jnp.einsum("bhqk,bhqd->bhkd", ds, q32)
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        dkc = lax.ppermute(dkc, axis_name, perm)
        dvc = lax.ppermute(dvc, axis_name, perm)

    return dq.astype(q.dtype), dkc.astype(k.dtype), dvc.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)
