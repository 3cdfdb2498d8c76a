"""int8 W8A8 GEMM: Pallas kernel vs XLA reference vs exact bf16 math."""

import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.ops.int8_gemm import (
    int8_matmul,
    int8_matmul_reference,
    quantize_weight,
)


def _inputs(m=96, k=256, n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.float32)
    return x, w


def test_weight_quantization_roundtrip():
    _, w = _inputs()
    w_i8, ws = quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and ws.shape == (w.shape[1],)
    back = np.asarray(w_i8, np.float32) * np.asarray(ws)[None, :]
    # symmetric per-channel int8: max error is half a quantization step
    step = np.asarray(ws)[None, :]
    assert np.all(np.abs(back - np.asarray(w)) <= 0.5 * step + 1e-8)


def test_kernel_matches_xla_reference_exactly():
    """The Pallas kernel and the XLA path implement the SAME quantized math
    (identical row scales, same rounding) — results must agree to f32
    rounding, independent of quantization error."""
    x, w = _inputs()
    w_i8, ws = quantize_weight(w)
    y_k = np.asarray(
        int8_matmul(x, w_i8, ws, block_m=32, block_n=128), np.float32
    )
    y_r = np.asarray(int8_matmul_reference(x, w_i8, ws), np.float32)
    np.testing.assert_allclose(y_k, y_r, rtol=0, atol=2e-2)


def test_quantized_output_near_exact_gemm():
    x, w = _inputs()
    w_i8, ws = quantize_weight(w)
    y_q = np.asarray(
        int8_matmul(x, w_i8, ws, block_m=32, block_n=128, out_dtype=jnp.float32),
        np.float32,
    )
    y_exact = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    rel = np.abs(y_q - y_exact) / (np.abs(y_exact).mean() + 1e-6)
    # int8 x int8 with per-row/per-channel scales: ~1% relative error band
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.mean(rel) < 0.05, np.mean(rel)


def test_row_padding():
    """M not divisible by block_m: padded rows must not leak into output."""
    x, w = _inputs(m=50)
    w_i8, ws = quantize_weight(w)
    y = int8_matmul(x, w_i8, ws, block_m=32, block_n=128)
    assert y.shape == (50, w.shape[1])
    y2 = int8_matmul(x[:33], w_i8, ws, block_m=32, block_n=128)
    np.testing.assert_array_equal(np.asarray(y[:33]), np.asarray(y2))


def test_shape_guards():
    x, w = _inputs(k=128)
    w_i8, ws = quantize_weight(w)
    with pytest.raises(AssertionError):
        int8_matmul(x[:, :64], w_i8, ws)  # K mismatch
