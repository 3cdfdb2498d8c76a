"""Fused transformer-MLP Pallas kernel: fc1 -> GELU -> fc2 in one pass.

Why this exists: the ViT-B block stack measures 64.2% MFU — the same as a
pure dense-GEMM stack — because at microbatch-24 ViT shapes each GEMM sits
at the v5e roofline knee (~530 FLOP/byte vs the chip's ~480 critical
intensity). XLA cannot fuse *across* two GEMMs, so the MLP materializes its
[M, 4D] hidden activation to HBM (fc1 write + fc2 read ~= 76 MB per
microbatch at ViT-B) and both GEMMs run marginally HBM-bound. This kernel
keeps both weight matrices VMEM-resident across the M-tile grid and never
writes the hidden to HBM: per M tile it computes gelu(x @ W1 + b1) @ W2 + b2
entirely on-chip, turning the MLP into a single MXU-bound pass.

The reference has no analogue (its MLP is two torch Linears,
`simple/building_blocks.py:94-129`); this is TPU-first scheduling of the
same math. Numerics match the unfused path exactly: f32 GEMM accumulation
via preferred_element_type and f32 GELU, then the hidden is rounded to the
input dtype before fc2 — the same bf16 rounding the unfused path performs
between fc1 and fc2 (deliberate, so fused and unfused are interchangeable
without a numerics delta; see the equality tolerance in tests).

VMEM budget at D=768, H=3072, bm=256 (bf16 weights):
    W1 + W2 resident         2 * 768*3072*2  = 9.4 MB
    x / out tiles (dbl-buf)  ~4 * 256*768*2  = 1.6 MB
    hidden f32 intermediate  256*3072*4      = 3.0 MB
    ~14 MB < 16 MB scoped VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default M tile. 256 keeps the f32 hidden intermediate at 3 MB; the sweep
# in benchmarks/bench_fused_mlp.py picks the winner per shape.
DEFAULT_BLOCK_M = 256

# Hidden widths above this would blow the resident-weights VMEM budget
# (W1+W2 must fit alongside the tiles); fall back to XLA there.
MAX_RESIDENT_WEIGHT_BYTES = 12 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fits_vmem(d: int, h: int, dtype_bytes: int = 2) -> bool:
    """Whether W1[d,h] + W2[h,d] can stay VMEM-resident."""
    return 2 * d * h * dtype_bytes <= MAX_RESIDENT_WEIGHT_BYTES


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, approx):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[...], approximate=approx)
    y = jnp.dot(h.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (y + b2_ref[...]).astype(o_ref.dtype)


def _fwd_call(x2d, w1, b1, w2, b2, *, approx, block_m, interpret):
    m, d = x2d.shape
    h = w1.shape[1]
    grid = (m // block_m,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, approx=approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((d, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2d, w1, b1, w2, b2)


def fused_mlp_reference(x, w1, b1, w2, b2, *, approx=True):
    """Unfused numerics oracle (the nn.Dense path's math, hidden kept f32)."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=approx)
    return (
        jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    ).astype(x.dtype)


def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    approx: bool = True,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool = False,
) -> jnp.ndarray:
    """gelu(x @ w1 + b1) @ w2 + b2, hidden never leaving VMEM.

    x: [..., D]; w1: [D, H]; w2: [H, D]. Returns [..., D] in x.dtype.
    Leading dims are flattened to one M axis and padded to block_m.
    """
    *lead, d = x.shape
    m = 1
    for s in lead:
        m *= s
    x2d = x.reshape(m, d)
    m_pad = _ceil_to(m, block_m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    out = _fwd_call(
        x2d,
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
        approx=approx,
        block_m=block_m,
        interpret=interpret,
    )
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, d)
