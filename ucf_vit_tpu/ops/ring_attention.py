"""Ring attention: sequence-parallel attention with rotating KV chunks.

True long-context sequence parallelism (capability-plus over the reference,
whose `seq_par_size` is declared but asserted ==1): each sp shard holds
N/sp queries AND N/sp keys/values; KV chunks rotate around the ring via
`lax.ppermute` while an online-softmax accumulator combines partial results.
Peak memory per chip is O(N/sp) — unlike the KV-gather fallback (O(N) keys)
— and unlike Ulysses it has no head-divisibility requirement.

Written with jnp ops (not a pallas kernel) so JAX autodiff differentiates
through the scan + ppermute (the transpose of a ppermute is the reverse
permutation); each chunk-pair attention is an einsum XLA fuses well at the
block sizes sequence parallelism produces.

Must be called inside shard_map with `axis_name` bound. [B, H, N/sp, dh].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    sp_size = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    q32 = q.astype(jnp.float32) * sm_scale
    bq = q.shape[2]

    def chunk(qc, kc, vc):
        """Partial attention of local queries against one KV chunk.
        Returns (unnormalized acc [B,H,Nq,dh], rowmax m, rowsum l)."""
        s = jnp.einsum("bhqd,bhkd->bhqk", qc, kc.astype(jnp.float32))
        m = jnp.max(s, axis=-1, keepdims=True)  # [B,H,Nq,1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vc.dtype), vc).astype(
            jnp.float32
        )
        return acc, m, l

    def body(carry, _):
        kc, vc, acc, m, l = carry
        acc_i, m_i, l_i = chunk(q32, kc, vc)
        m_new = jnp.maximum(m, m_i)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_i - m_new)
        acc = acc * a + acc_i * b
        l = l * a + l_i * b
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        return (kc, vc, acc, m_new, l), None

    b_, h_, nq, dh = q.shape
    acc0 = jnp.zeros((b_, h_, nq, dh), jnp.float32)
    m0 = jnp.full((b_, h_, nq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b_, h_, nq, 1), jnp.float32)

    carry = (k, v, acc0, m0, l0)
    for _ in range(sp_size):  # sp_size is small and static: unrolled ring
        carry, _ = body(carry, None)
    _, _, acc, m, l = carry
    out = acc / jnp.maximum(l, 1e-37)
    return out.astype(q.dtype)
