"""W8A8 int8 GEMM study at ViT-B serving shapes: Pallas vs XLA vs bf16.

Round-3 BASELINE.md recorded that XLA's int8 dot loses to bf16 at these
shapes and said "revisit only with a Pallas int8 kernel". This benchmark is
that revisit: the `ops/int8_gemm.py` kernel fuses dynamic activation
quantization + int8 MXU dot + dequant epilogue into one VMEM-resident tile
program, eliminating the HBM passes the XLA path pays.

Rows:
    bf16 f32acc  — jnp.dot(x, w)                       (the serving status quo)
    bf16 bf16acc — preferred_element_type=bf16
    xla  w8a8    — int8_matmul_reference (quantize / int8 dot / dequant in XLA)
    pallas w8a8  — int8_matmul kernel, (block_m, block_n) sweep

MFU is vs the v5e bf16 peak (197 TFLOPs) for every row, so a number > 100%
is only reachable via the int8 MXU rate — that's the signal this study
exists to detect.

Timing: chained fori_loop inside one jit (see bench_fused_mlp.py for why).

Usage: python benchmarks/bench_int8_gemm.py [M] [K] [N]
  defaults: 6304 768 3072  (ViT-B fc1 at serving batch 24, tokens 257+pad)
  also try: 6304 3072 768  (fc2)   6304 768 2304  (qkv)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.ops.int8_gemm import (  # noqa: E402
    int8_matmul,
    int8_matmul_reference,
    quantize_weight,
)

ITERS = 30


def chain_time(op, x, args):
    """Mean per-iter time of op run ITERS times inside one jit; the output
    is folded back into the next input to force sequential execution."""
    x0 = x
    m, k = x.shape

    @jax.jit
    def run(x, *args):
        def body(_, xx):
            y = op(xx, *args)
            n = y.shape[1]
            feed = y[:, :k] if n >= k else jnp.tile(y, (1, (k + n - 1) // n))[:, :k]
            return (feed.astype(jnp.float32) * 0.01 + x0.astype(jnp.float32)).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    out = run(x, *args)
    float(out[0, 0].astype(jnp.float32))
    best = float("inf")
    for _ in range(3):  # best-of-3: the r3 study showed single-shot noise
        t0 = time.perf_counter()
        out = run(x, *args)
        float(out[0, 0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 6304
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.float32)
    w_bf = w.astype(jnp.bfloat16)
    w_i8, ws = quantize_weight(w)

    flops = 2 * m * k * n
    dev = jax.devices()[0]
    peak = 197e12 if "v5" in dev.device_kind.lower() else 275e12
    print(f"[{m},{k}]x[{k},{n}] on {dev.device_kind}; MFU vs bf16 peak")

    t = chain_time(lambda xx, ww: jnp.dot(xx, ww), x, (w_bf,))
    t_bf16 = t
    print(f"bf16 f32acc : {t*1e6:8.1f} us  {flops/t/peak*100:6.1f}% MFU", flush=True)

    t = chain_time(
        lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.bfloat16),
        x, (w_bf,),
    )
    print(f"bf16 bf16acc: {t*1e6:8.1f} us  {flops/t/peak*100:6.1f}% MFU", flush=True)

    t = chain_time(int8_matmul_reference, x, (w_i8, ws))
    print(f"xla  w8a8   : {t*1e6:8.1f} us  {flops/t/peak*100:6.1f}% MFU"
          f"  (vs bf16 {t_bf16/t:.2f}x)", flush=True)

    for bm in (256, 512, 1024):
        for bn in (256, 512, 1024):
            if n % bn:
                continue
            fn = functools.partial(int8_matmul, block_m=bm, block_n=bn)
            try:
                t = chain_time(fn, x, (w_i8, ws))
            except Exception as e:  # noqa: BLE001
                print(f"pallas bm={bm} bn={bn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}")
                continue
            err = np.abs(
                np.asarray(fn(x, w_i8, ws), np.float32)
                - np.asarray(int8_matmul_reference(x, w_i8, ws), np.float32)
            ).max()
            print(f"pallas w8a8 bm={bm:4d} bn={bn:4d}: {t*1e6:8.1f} us  "
                  f"{flops/t/peak*100:6.1f}% MFU  (vs bf16 {t_bf16/t:.2f}x, "
                  f"max|err vs xla w8a8| {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
