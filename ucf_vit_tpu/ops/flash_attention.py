"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's third-party fused-attention tiers
(xformers FlashAttention / Composable-Kernel / torch SDPA — reference
`src/UCF_VIT/simple/building_blocks.py:163-187`). One kernel covers what the
reference needed two vendor libraries for.

Design (see the classic flash-attention tiling):
- Grid (batch*heads, q_blocks, kv_blocks); kv dimension is the online-softmax
  reduction and is marked "arbitrary", the rest are "parallel".
- Running max `m`, normalizer `l`, and the output accumulator live in VMEM
  scratch in float32 regardless of input dtype; matmuls use
  preferred_element_type=float32 so bf16 inputs accumulate in f32.
- Sequence lengths that are not multiples of the block size (ViT: 197/257/729
  tokens) are zero-padded by the wrapper; padded key columns are masked with a
  large negative constant (not -inf, to avoid exp(-inf - -inf) NaNs).
- Backward is a custom VJP. Default: ONE fused kernel computing dq, dk, dv in
  a single sweep (5 matmuls total = 2.5x forward FLOPs): grid (bh, kv, q) with
  the kv dimension sequential; dk/dv accumulate in per-kv-block scratch across
  the inner q sweep, dq accumulates in a full-sequence f32 VMEM scratch
  (n_q_pad x dh — ~1 MB at N=4096, dh=64) and is flushed on the final kv
  sweep. This recomputes p/ds once instead of twice, unlike the classic
  two-kernel split (7 matmuls = 3.5x forward). When the dq scratch would not
  fit VMEM (very long sequences), falls back to the two-kernel path: dkv
  (iterates q blocks per kv block) and dq (iterates kv blocks per q block).
  Both share the standard residuals (o, lse) plus di = rowsum(do * o).
- Attention-probability dropout (reference `attn_drop` inside its fused
  xformers kernels, `simple/building_blocks.py:163-174`) runs INSIDE both
  directions: the keep mask is a stateless hash of global (row, col,
  batch-head) coordinates (ops/attn_dropout.py), regenerated — never stored —
  by the backward, which may therefore tile differently than the forward.
  Forward drops the unnormalized probabilities AFTER the normalizer update
  (dropout commutes with the final 1/l scaling), so `lse` stays the
  pre-dropout softmax normalizer and di = rowsum(do * o) remains the correct
  softmax-jacobian row term (o is bilinear in the dropped probs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucf_vit_tpu.ops.attn_dropout import keep_mask

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
MIN_BLOCK = 128
NUM_LANES = 128
# Measured on v5e at N=2048-4096 (dh=64): 512/1024 runs 4-6x faster than
# 128/128 (bigger MXU tiles, fewer grid steps); clamped to padded lengths.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    meta_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    dropout_rate: float,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [block_q, dh]
    k = k_ref[0]  # [block_k, dh]

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k]
    s = s * sm_scale

    # Mask padded key columns (static kv_len -> compile-time constant mask for
    # all but the last block).
    col0 = kv_idx * block_k
    if kv_len % block_k != 0:
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]  # [block_q, NUM_LANES]
    l_prev = l_scr[...]

    m_cur = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
    m_next = jnp.maximum(m_prev, m_cur)  # broadcast to lanes
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = m_next
    l_scr[...] = l_next

    if dropout_rate > 0.0:
        # Drop AFTER the l update: l stays the pre-dropout normalizer, so the
        # final acc/l equals dropout(softmax) @ v (dropout scaling commutes
        # with the row-wise division) and lse stays exact for the backward.
        z = keep_mask(
            meta_ref[0],
            pl.program_id(0),
            meta_ref[1] + pl.program_id(1) * block_q,
            meta_ref[2] + kv_idx * block_k,
            p.shape,
            dropout_rate,
        )
        p = jnp.where(z, p * (1.0 / (1.0 - dropout_rate)), 0.0)

    v = v_ref[0]  # [block_k, dh]
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[...]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv[:, : acc_scr.shape[-1]]).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...] + jnp.log(jnp.maximum(l_final, 1e-37))).astype(
            lse_ref.dtype
        )


# ----------------------------------------------------------------------------
# Backward kernels
# ----------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    meta_ref,
    dk_ref,
    dv_ref,
    dk_scr,
    dv_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    dropout_rate: float,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [block_q, dh]
    k = k_ref[0]  # [block_k, dh]
    v = v_ref[0]
    do = do_ref[0]  # [block_q, dh]
    lse = lse_ref[0][:, :1]  # [block_q, 1]
    di = di_ref[0][:, :1]  # [block_q, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    col0 = kv_idx * block_k
    if kv_len % block_k != 0:
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # [block_q, block_k] (pre-dropout probabilities)

    if dropout_rate > 0.0:
        # regenerate the forward's keep mask from global coordinates
        z = keep_mask(
            meta_ref[0],
            pl.program_id(0),
            meta_ref[1] + q_idx * block_q,
            meta_ref[2] + kv_idx * block_k,
            p.shape,
            dropout_rate,
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_v = jnp.where(z, p * inv_keep, 0.0)  # post-dropout probs
    else:
        p_v = p

    # dv += dropout(p)^T @ do
    dv_scr[...] += jax.lax.dot_general(
        p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dp = do @ v^T (grad wrt dropped probs); chain through dropout, then
    # softmax: ds = p * (dp - di) * sm_scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = jnp.where(z, dp * inv_keep, 0.0)
    ds = p * (dp - di) * sm_scale  # [block_q, block_k]

    # dk += ds^T @ q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    meta_ref,
    dk_ref,
    dv_ref,
    dq_ref,
    dk_scr,
    dv_scr,
    dq_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    num_kv_blocks: int,
    dropout_rate: float,
):
    """Single-pass backward: dq + dk + dv from one p/ds recompute.

    Grid (bh, kv_blocks, q_blocks); kv and q are both sequential. dk/dv
    accumulate in [block_k, dh] scratch over the inner q sweep (stored when
    q_idx hits the last block). dq accumulates per-q-row in a full-sequence
    [n_q_pad, dh] f32 scratch across kv sweeps; each visit writes the running
    partial to dq_ref (the write-back happens anyway when the output block
    rotates), so the final kv sweep's write-back leaves the completed dq.
    """
    kv_idx = pl.program_id(1)
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init_kv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [block_q, dh]
    k = k_ref[0]  # [block_k, dh]
    v = v_ref[0]
    do = do_ref[0]  # [block_q, dh]
    lse = lse_ref[0][:, :1]  # [block_q, 1]
    di = di_ref[0][:, :1]  # [block_q, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    if kv_len % block_k != 0:
        col_ids = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # [block_q, block_k] (pre-dropout probabilities)

    if dropout_rate > 0.0:
        z = keep_mask(
            meta_ref[0],
            pl.program_id(0),
            meta_ref[1] + q_idx * block_q,
            meta_ref[2] + kv_idx * block_k,
            p.shape,
            dropout_rate,
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_v = jnp.where(z, p * inv_keep, 0.0)
    else:
        p_v = p

    # dv += dropout(p)^T @ do
    dv_scr[...] += jax.lax.dot_general(
        p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dp = do @ v^T ; chain through dropout; ds = p * (dp - di) * sm_scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = jnp.where(z, dp * inv_keep, 0.0)
    ds = p * (dp - di) * sm_scale  # [block_q, block_k]

    # dk += ds^T @ q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dq rows for this q block accumulate across the kv (outer) sweeps.
    dq_contrib = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, dh]
    row0 = pl.multiple_of(q_idx * block_q, block_q)

    @pl.when(kv_idx == 0)
    def _dq_first():
        dq_scr[pl.ds(row0, block_q), :] = dq_contrib

    @pl.when(kv_idx > 0)
    def _dq_accum():
        dq_scr[pl.ds(row0, block_q), :] += dq_contrib

    dq_ref[0] = dq_scr[pl.ds(row0, block_q), :].astype(dq_ref.dtype)

    @pl.when(q_idx == num_q_blocks - 1)
    def _store_kv():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    meta_ref,
    dq_ref,
    dq_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    dropout_rate: float,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    di = di_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    col0 = kv_idx * block_k
    if kv_len % block_k != 0:
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        z = keep_mask(
            meta_ref[0],
            pl.program_id(0),
            meta_ref[1] + pl.program_id(1) * block_q,
            meta_ref[2] + kv_idx * block_k,
            p.shape,
            dropout_rate,
        )
        dp = jnp.where(z, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
    ds = p * (dp - di) * sm_scale

    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


# ----------------------------------------------------------------------------
# Public API with custom VJP + padding wrapper
# ----------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int = DEFAULT_BLOCK_K,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    dropout_offset: tuple = (0, 0),
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, H, N, dh] (or [B, H, Nq, dh] x [B, H, Nkv, dh]).

    Pads sequence lengths to block multiples internally; padded keys are
    masked, padded query rows are sliced away. Returns [B, H, Nq, dh].

    dropout_rate: attention-probability dropout INSIDE the kernel (reference
    `attn_drop` through xformers, `simple/building_blocks.py:163-174`).
    dropout_seed: int32 scalar (traced ok) — required when dropping.
    dropout_offset: (row0, col0) global-coordinate origin of this call's
    q/kv tiles — lets a sequence-parallel caller (KV-gather SP) present each
    shard's true position so the combined mask is one global Bernoulli draw.
    """
    b, h, n_q, dh = q.shape
    n_kv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dh)
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        assert dropout_rate < 1.0, f"dropout_rate {dropout_rate} must be < 1"
        assert dropout_seed is not None, "dropout_rate > 0 needs dropout_seed"
        meta = jnp.stack(
            [
                jnp.asarray(dropout_seed, jnp.int32).reshape(()),
                jnp.asarray(dropout_offset[0], jnp.int32).reshape(()),
                jnp.asarray(dropout_offset[1], jnp.int32).reshape(()),
            ]
        )
    else:
        meta = jnp.zeros((3,), jnp.int32)

    if block_q is None:
        # None = auto (an EXPLICIT block_q is always honored, so the block
        # sweep benchmark can measure 512 vs 1024 in the long regime).
        # Long-context: bq=1024 measured 13% faster fwd+bwd than 512 at
        # [1,6,32768,96] on v5e (92.4 vs 104.7 ms; the backward's kv block
        # is clamped there, so q-block width is the remaining lever).
        # Sweep: benchmarks/bench_flash_blocks.py, BASELINE.md round 3.
        block_q = 1024 if n_q >= 16384 else DEFAULT_BLOCK_Q
    block_q = min(block_q, _ceil_to(n_q, MIN_BLOCK))
    block_k = min(block_k, _ceil_to(n_kv, MIN_BLOCK))
    n_q_pad = _ceil_to(n_q, block_q)
    n_kv_pad = _ceil_to(n_kv, block_k)

    qf = q.reshape(b * h, n_q, dh)
    kf = k.reshape(b * h, n_kv, dh)
    vf = v.reshape(b * h, n_kv, dh)
    if n_q_pad != n_q:
        qf = jnp.pad(qf, ((0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_kv_pad != n_kv:
        kf = jnp.pad(kf, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))

    # The kernels mask key columns >= the true kv length; bake the true length
    # in before padding so the mask constant is correct.
    out = _flash_len_cache(n_kv, interpret, dropout_rate)(
        qf, kf, vf, meta, sm_scale, block_q, block_k
    )
    out = out[:, :n_q]
    return out.reshape(b, h, n_q, dh)


def _meta_cotangent(meta):
    import numpy as np

    return np.zeros(meta.shape, jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def _flash_len_cache(kv_len: int, interpret: bool = False, dropout_rate: float = 0.0):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
    def fn(q, k, v, meta, sm_scale, block_q, block_k):
        out, _ = _flash_fwd_len(
            q, k, v, meta, kv_len, sm_scale, block_q, block_k, dropout_rate, interpret
        )
        return out

    def fn_fwd(q, k, v, meta, sm_scale, block_q, block_k):
        out, lse = _flash_fwd_len(
            q, k, v, meta, kv_len, sm_scale, block_q, block_k, dropout_rate, interpret
        )
        return out, (q, k, v, out, lse, meta)

    def fn_bwd(sm_scale, block_q, block_k, res, do):
        q, k, v, out, lse, meta = res
        dq, dk, dv = _flash_bwd_len(
            q, k, v, out, lse, do, meta, kv_len, sm_scale, block_q, block_k,
            dropout_rate, interpret,
        )
        return dq, dk, dv, _meta_cotangent(meta)

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


_META_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _flash_fwd_len(
    q, k, v, meta, kv_len, sm_scale, block_q, block_k, dropout_rate=0.0,
    interpret=False,
):
    bh, n_q, dh = q.shape
    _, n_kv_pad, _ = k.shape
    num_q_blocks = n_q // block_q
    num_kv_blocks = n_kv_pad // block_k

    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        dropout_rate=dropout_rate,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b, j, 0)),
            _META_SPEC,
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, NUM_LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n_q, NUM_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, meta)
    return out, lse


# Full-sequence f32 dq scratch cap for the fused backward; beyond this the
# two-kernel fallback is used (n_q_pad * lane-padded-dh * 4 bytes; 6 MB =
# 12k tokens at any dh <= 128, since VMEM lanes pad dh to 128).
FUSED_BWD_DQ_SCRATCH_BYTES = 6 * 1024 * 1024


def _dq_scratch_bytes(n_q: int, dh: int) -> int:
    """VMEM footprint of the fused backward's full-sequence f32 dq scratch.
    VMEM tiles pad the lane (last) dimension to NUM_LANES, so dh=48 costs
    the same as dh=128 — the nominal-dh estimate under-counted by 2.7x and
    let a 16.8 MB scratch through a 6 MB budget (mae_long OOM)."""
    return n_q * _ceil_to(dh, NUM_LANES) * 4


# dq-scratch size above which the backward narrows its kv block (see
# _bwd_block_k). Module constant so tests can trigger the clamp at small
# shapes.
BWD_BLOCK_K_CLAMP_BYTES = 4 * 1024 * 1024


# Two-kernel backward VMEM budget on the [block_q, block_k] f32
# intermediates (s, p, dp, ds + exp temporaries ~= 5 tensors): cap the
# product so ~5 * bq * bk * 4 bytes stays ~10 MB, leaving room for the
# q/k/v/do tiles. 512*1024 (the tuned mid-range default) sits at 10.5 MB.
BWD_BLOCK_PRODUCT_CAP = 512 * 1024


def _bwd_block_k(
    n_q: int, dh: int, block_q: int, block_k: int, n_kv_pad: int, fused: bool
) -> int:
    """Scoped-VMEM guard for the backward kv block.

    Fused path: the kernel holds the full-sequence f32 dq scratch PLUS ~5
    [block_q, block_k] f32 intermediates (s, p, dp, ds, exp). When the dq
    scratch is large (long N), a 1024-wide kv block pushes the total past
    the 16 MB scoped-VMEM limit; halving block_k keeps the fused
    single-sweep kernel viable longer before the two-kernel fallback.

    Two-kernel path: no full-sequence scratch, so the cap is just the
    intermediates product (BWD_BLOCK_PRODUCT_CAP) — at the long-context
    auto block_q=1024 this resolves to block_k=512, but an explicit
    wider-kv/narrower-q request stays honored.

    The result must DIVIDE n_kv_pad (which was padded to a multiple of the
    forward's block_k): `num_kv_blocks = n_kv_pad // block_k` floor-drops
    the trailing kv block otherwise, silently zeroing its dk/dv (caught in
    review round 3: cross-attention q 8448 x kv 640 returned NaN dk for keys
    512..639). Step down in MIN_BLOCK multiples until it divides; n_kv_pad
    is always a multiple of MIN_BLOCK, so 128 is a guaranteed floor."""
    if fused:
        if _dq_scratch_bytes(n_q, dh) > BWD_BLOCK_K_CLAMP_BYTES:
            block_k = min(block_k, 512)
    else:
        while block_q * block_k > BWD_BLOCK_PRODUCT_CAP and block_k > MIN_BLOCK:
            block_k //= 2
    while n_kv_pad % block_k:
        block_k -= MIN_BLOCK
    return block_k


def _flash_bwd_len(
    q, k, v, o, lse, do, meta, kv_len, sm_scale, block_q, block_k,
    dropout_rate=0.0, interpret=False,
):
    bh, n_q, dh = q.shape
    _, n_kv_pad, _ = k.shape
    fused = _dq_scratch_bytes(n_q, dh) <= FUSED_BWD_DQ_SCRATCH_BYTES
    block_k = _bwd_block_k(n_q, dh, block_q, block_k, n_kv_pad, fused)
    num_q_blocks = n_q // block_q
    num_kv_blocks = n_kv_pad // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (bh, n_q, NUM_LANES))

    if fused:
        fused_kernel = functools.partial(
            _bwd_fused_kernel,
            sm_scale=sm_scale,
            kv_len=kv_len,
            block_q=block_q,
            block_k=block_k,
            num_q_blocks=num_q_blocks,
            num_kv_blocks=num_kv_blocks,
            dropout_rate=dropout_rate,
        )
        dk, dv, dq = pl.pallas_call(
            fused_kernel,
            grid=(bh, num_kv_blocks, num_q_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, block_q, dh), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, block_q, NUM_LANES), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, block_q, NUM_LANES), lambda b, j, i: (b, i, 0)),
                _META_SPEC,
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, block_q, dh), lambda b, j, i: (b, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_kv_pad, dh), k.dtype),
                jax.ShapeDtypeStruct((bh, n_kv_pad, dh), v.dtype),
                jax.ShapeDtypeStruct((bh, n_q, dh), q.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, dh), jnp.float32),
                pltpu.VMEM((block_k, dh), jnp.float32),
                pltpu.VMEM((n_q, dh), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(q, k, v, do, lse, di, meta)
        return dq, dk, dv

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=num_q_blocks,
        dropout_rate=dropout_rate,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, dh), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, NUM_LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, NUM_LANES), lambda b, j, i: (b, i, 0)),
            _META_SPEC,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_kv_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, n_kv_pad, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di, meta)

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        dropout_rate=dropout_rate,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, NUM_LANES), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, NUM_LANES), lambda b, i, j: (b, i, 0)),
            _META_SPEC,
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di, meta)

    return dq, dk, dv
