"""Fused attention for short sequences (Pallas TPU).

The ViT workloads in this framework run 196-730 tokens — at those lengths
the whole [N, N] score matrix of one head fits comfortably in VMEM, so the
online-softmax machinery of a flash kernel is pure overhead, and the XLA
einsum path pays ~200 MB/layer of HBM traffic materializing probabilities
(and stores them for backward). This kernel:

- processes G heads per grid step ([G, Np, dh] blocks) to amortize pipeline
  bubbles (768 one-head programs -> 96 eight-head programs);
- computes softmax in one shot per head (single max/exp pass, no running
  m/l state, no lse output);
- backward is ONE kernel producing dq, dk, dv together, recomputing p with
  a single extra exp instead of storing [B, H, N, N] probabilities.

Replaces the reference's fused-attention tiers for its actual workloads
(`src/UCF_VIT/utils/fused_attn.py`, dispatch in
`simple/building_blocks.py:163-187`); long sequences use
ops/flash_attention.py instead (see ops/attention.py dispatch).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, kv_len, n_pad, g):
    def one_head(i, _):
        q = q_ref[i]  # [Np, dh]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [Np, Np]
        if kv_len != n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, MASK)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * jax.lax.reciprocal(l)
        o_ref[i] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g, one_head, 0, unroll=True)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, sm_scale, kv_len, n_pad, g,
):
    def one_head(i, _):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        do = do_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if kv_len != n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, MASK)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * jax.lax.reciprocal(l)  # softmax probs [Np, Np] f32

        pb = p.astype(do.dtype)
        # dv = p^T @ do
        dv_ref[i] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dp = do @ v^T ; di = rowsum(dp * p) (== rowsum(do * o))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        di = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - di) * sm_scale).astype(q.dtype)  # [Np, Np]
        # dq = ds @ k ; dk = ds^T @ q
        dq_ref[i] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[i] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g, one_head, 0, unroll=True)


def _pick_g(bh: int, n_pad: int, dh: int) -> int:
    """Heads per grid step, bounded by VMEM (~6 MB working set target)."""
    per_head = 7 * n_pad * dh * 2 + 2 * n_pad * n_pad * 4  # q,k,v,do,dq,dk,dv + s,p
    g = max(int(6e6) // max(per_head, 1), 1)
    g = min(g, 8)
    while g > 1 and bh % g:
        g -= 1
    return g


@functools.lru_cache(maxsize=None)
def _short_cached(kv_len: int, interpret: bool):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def fn(q, k, v, sm_scale):
        return _fwd(q, k, v, sm_scale)

    def _fwd(q, k, v, sm_scale):
        bh, n_pad, dh = q.shape
        g = _pick_g(bh, n_pad, dh)
        kernel = functools.partial(
            _fwd_kernel, sm_scale=sm_scale, kv_len=kv_len, n_pad=n_pad, g=g
        )
        return pl.pallas_call(
            kernel,
            grid=(bh // g,),
            in_specs=[
                pl.BlockSpec((g, n_pad, dh), lambda b: (b, 0, 0)),
                pl.BlockSpec((g, n_pad, dh), lambda b: (b, 0, 0)),
                pl.BlockSpec((g, n_pad, dh), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((g, n_pad, dh), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(q, k, v)

    def fn_fwd(q, k, v, sm_scale):
        return _fwd(q, k, v, sm_scale), (q, k, v)

    def fn_bwd(sm_scale, res, do):
        q, k, v = res
        bh, n_pad, dh = q.shape
        g = _pick_g(bh, n_pad, dh)
        kernel = functools.partial(
            _bwd_kernel, sm_scale=sm_scale, kv_len=kv_len, n_pad=n_pad, g=g
        )
        spec = pl.BlockSpec((g, n_pad, dh), lambda b: (b, 0, 0))
        shape = jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype)
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid=(bh // g,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            out_shape=[shape] * 3,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(q, k, v, do)
        return dq, dk, dv

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-sequence attention over [B, H, N, dh] (self-attention:
    Nq == Nkv). Sequence padded to a lane multiple; padded key columns
    masked; padded query rows sliced away."""
    b, h, n, dh = q.shape
    assert k.shape[2] == n, "short_attention is for self-attention"
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dh)
    n_pad = _ceil_to(n, LANES)
    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
    out = _short_cached(n, interpret)(qf, kf, vf, sm_scale)
    return out[:, :n].reshape(b, h, n, dh)
