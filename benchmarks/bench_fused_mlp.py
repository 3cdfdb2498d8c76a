"""Isolated fused-MLP kernel study at the ViT-B bench shapes.

Compares, at [M=6168 (=24 x 257 tokens), D=768, H=3072] bf16:
    xla    — jnp fc1 -> gelu -> fc2 (what nn.Dense compiles to)
    fused  — ops/fused_mlp.py Pallas megakernel (hidden stays in VMEM)

fwd-only and fwd+bwd (bwd via XLA autodiff for xla; fused bwd once it has a
custom VJP). Evidence standard: same as the round-2 SHORT-kernel study —
the kernel ships only if it wins in-stack, not just isolated.

Timing: the op runs ITERS times inside ONE jit via lax.fori_loop with the
output chained into the next input — per-dispatch relay latency (~0.1-2 ms)
would otherwise swamp a ~250 us op. Sync is a float() device->host fetch.

Usage: python benchmarks/bench_fused_mlp.py [M] [D] [H]
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

from ucf_vit_tpu.ops.fused_mlp import fused_mlp, fused_mlp_reference  # noqa: E402

ITERS = 30


def chain_time(op, x, args):
    """Mean per-iteration time of op run ITERS times inside one jit.

    op(x, *args) must return something x-shaped; each iteration feeds the
    previous output (renormalized so bf16 doesn't overflow across the chain)
    back in, forcing sequential execution on-device.
    """

    x0 = x

    @jax.jit
    def run(x, *args):
        def body(_, xx):
            # Chain with a cheap elementwise damp (no reductions — a cross-
            # [M,D] max here serializes the MXU pipeline between iterations):
            # y stays bounded because |y*0.01| << |x0|.
            return (op(xx, *args) * 0.01 + x0).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    out = run(x, *args)  # compile + warm
    float(out[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    out = run(x, *args)
    float(out[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / ITERS


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 24 * 257
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.bfloat16)

    flops = 2 * m * d * h * 2  # fc1 + fc2
    dev = jax.devices()[0]
    peak = 394e12 if "v5" in dev.device_kind.lower() else 275e12

    t_x = chain_time(fused_mlp_reference, x, (w1, b1, w2, b2))
    print(f"xla   fwd: {t_x*1e6:8.1f} us  {flops/t_x/peak*100:5.1f}% MFU", flush=True)

    for bm in (128, 256, 512):
        fn = functools.partial(fused_mlp, block_m=bm)
        try:
            t_f = chain_time(fn, x, (w1, b1, w2, b2))
        except Exception as e:  # noqa: BLE001
            print(f"fused bm={bm}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        err = np.abs(
            np.asarray(fn(x, w1, b1, w2, b2), np.float32)
            - np.asarray(fused_mlp_reference(x, w1, b1, w2, b2), np.float32)
        ).max()
        print(
            f"fused bm={bm} fwd: {t_f*1e6:8.1f} us  {flops/t_f/peak*100:5.1f}% MFU"
            f"  (vs xla {t_x/t_f:.2f}x, max|err| {err:.2e})",
            flush=True,
        )

    # fwd+bwd: grad wrt every arg; dx chains into the next x, weight-grad
    # scalars are folded into the carry so nothing is dead-code-eliminated.
    def grad_op(ref_fn, xx, w1, b1, w2, b2):
        def loss(*a):
            return jnp.sum(ref_fn(*a).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xx, w1, b1, w2, b2)
        leak = (
            g[1][0, 0] + g[2][0] + g[3][0, 0] + g[4][0]
        ).astype(jnp.float32) * 1e-9
        return g[0] + leak.astype(xx.dtype)

    t_gx = chain_time(functools.partial(grad_op, fused_mlp_reference), x, (w1, b1, w2, b2))
    print(f"xla   fwd+bwd: {t_gx*1e6:8.1f} us  {3*flops/t_gx/peak*100:5.1f}% MFU", flush=True)

    try:
        t_gf = chain_time(functools.partial(grad_op, fused_mlp), x, (w1, b1, w2, b2))
        print(
            f"fused fwd+bwd: {t_gf*1e6:8.1f} us  {3*flops/t_gf/peak*100:5.1f}% MFU"
            f"  (vs xla {t_gx/t_gf:.2f}x)"
        )
    except Exception as e:  # noqa: BLE001
        print(f"fused fwd+bwd: unavailable ({type(e).__name__})")


if __name__ == "__main__":
    main()
