"""W8A8 int8 GEMM Pallas kernel with fused dynamic activation quantization.

Why this exists: the round-3 int8 study (BASELINE.md) showed that a plain
XLA `lax.dot_general(int8, int8, preferred_element_type=int32)` runs AT OR
BELOW the bf16 rate at ViT-B serving shapes — XLA schedules the int8 dot
through the same pipeline and the per-row dynamic activation quantization
(abs-max, round, rescale) costs ~4% on top as separate HBM-bound elementwise
passes. The study's closing note: "revisit only with a Pallas int8 kernel
and native-layout evidence." This is that kernel.

Design (one pallas_call, grid (M/bm, N/bn)):
  - weights are quantized ONCE offline, per output channel (symmetric):
    `quantize_weight` returns (w_i8[K,N], wscale[N] f32).
  - per M-tile, the kernel computes the row abs-max of x in VMEM, quantizes
    to int8 *on-chip* (the quantized activation never exists in HBM),
    runs the int8 x int8 -> int32 MXU dot, and rescales straight to the
    output dtype with (row_scale * col_scale) fused into the epilogue.
  - so vs the XLA path, the kernel removes: the f32->int8 activation
    round-trip through HBM, the separate scale pass, and the int32->bf16
    dequant pass — all folded into one VMEM-resident tile program.

The MXU's int8 path on v5e has 2x the bf16 MACs (394.7 TOPS vs 197 TFLOPs);
whether Mosaic reaches that rate at these shapes is exactly what
`benchmarks/bench_int8_gemm.py` measures. The kernel ships only if it wins
end-to-end (same evidence standard as the SHORT-attention and fused-MLP
studies); it is correct and tested either way (`tests/test_int8_gemm.py`).

The reference has no quantized path at all (torch bf16/fp32 throughout,
e.g. `/root/reference/src/UCF_VIT/simple/building_blocks.py`); this is a
serving-oriented capability the TPU design adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_M = 512
DEFAULT_BLOCK_N = 512

# Full-K tiles: [bm, K] activations + [K, bn] int8 weights must fit VMEM
# alongside the int32 accumulator. K <= 4096 keeps the pair under ~6 MB.
MAX_FULL_K = 4096


def quantize_weight(w):
    """Per-output-channel symmetric int8 quantization.

    Returns (w_i8[K,N], wscale[N] float32) with w ~= w_i8 * wscale[None, :].
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_i8, scale


def _kernel(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    # Per-row dynamic activation scale, computed on-chip per M tile. The
    # row max is over the FULL K (x_ref carries all of K), so every N tile
    # sees the same quantization of x — bitwise consistent across the grid.
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    row_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * ws_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def int8_matmul(
    x,
    w_i8,
    wscale,
    *,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    out_dtype=None,
    interpret: bool = False,
):
    """y[M,N] ~= x[M,K] @ (w_i8 * wscale[None,:]) with W8A8 int8 MXU math.

    x is the raw (bf16/f32) activation; quantization happens inside the
    kernel per M tile. Rows of x are padded to block_m; K must be <= the
    full-K VMEM budget (this kernel targets attention/MLP projection shapes
    where K is the model width).
    """
    m, k = x.shape
    k2, n = w_i8.shape
    assert k == k2, (x.shape, w_i8.shape)
    assert k <= MAX_FULL_K, f"K={k} exceeds the full-K VMEM budget"
    assert n % block_n == 0, (n, block_n)
    out_dtype = out_dtype or x.dtype

    if jax.default_backend() == "cpu" and not interpret:
        interpret = True

    mp = (m + block_m - 1) // block_m * block_m
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(mp // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(x, w_i8, wscale.reshape(1, n).astype(jnp.float32))
    return out[:m]


def int8_matmul_reference(x, w_i8, wscale, out_dtype=None):
    """Same W8A8 math through plain XLA ops (the round-3 study's path):
    separate quantize pass, int8 dot, separate dequant pass."""
    out_dtype = out_dtype or x.dtype
    xf = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    row_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * wscale[None, :].astype(jnp.float32)
    return y.astype(out_dtype)
