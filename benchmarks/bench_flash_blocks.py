"""Flash-attention block-size sweep on the long-context decoder shapes.

The DEFAULT_BLOCK_Q/K (512/1024) were tuned at dh=64 on v5e; the
long-context 3D MAE decoder runs [B=1, H=6, N=32768, dh=96]. This sweeps
(block_q, block_k) for fwd and fwd+bwd at a given shape, timed with the
in-jit chained fori_loop harness (dispatch latency through the relay makes
per-call timing useless — see benchmarks/README.md).

Usage: python benchmarks/bench_flash_blocks.py [N] [dh] [heads] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()


import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
DH = int(sys.argv[2]) if len(sys.argv) > 2 else 96
H = int(sys.argv[3]) if len(sys.argv) > 3 else 6
B = int(sys.argv[4]) if len(sys.argv) > 4 else 1
REPS = 8


def chain_time(fn, *args, reps=REPS):
    """Time fn chained reps times inside ONE jit (data-dependent iterations)."""

    @jax.jit
    def loop(a0):
        def body(_, a):
            out = fn(a)
            # feed a scalar of the output back so iterations serialize
            return a * 0.0 + a + 1e-12 * jnp.mean(out)

        return jax.lax.fori_loop(0, reps, body, a0)

    loop(args[0]).block_until_ready()
    t0 = time.perf_counter()
    r = loop(args[0])
    float(jnp.mean(r))  # device->host sync (block_until_ready lies via relay)
    return (time.perf_counter() - t0) / reps


def main():
    from ucf_vit_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, DH)), jnp.bfloat16)

    results = []
    for bq in (256, 512, 1024):
        for bk in (512, 1024, 2048):
            if bq > N or bk > N:
                continue

            def fwd(x, bq=bq, bk=bk):
                return flash_attention(x, x, x, block_q=bq, block_k=bk)

            def train(x, bq=bq, bk=bk):
                def loss(y):
                    return jnp.sum(
                        flash_attention(y, y, y, block_q=bq, block_k=bk)
                        .astype(jnp.float32) ** 2
                    )

                return jax.grad(loss)(x)

            try:
                t_f = chain_time(fwd, q)
                t_b = chain_time(train, q)
            except Exception as e:  # VMEM overflow etc. — record and move on
                results.append({"bq": bq, "bk": bk, "error": str(e)[:100]})
                print(json.dumps(results[-1]), flush=True)
                continue
            results.append(
                {"bq": bq, "bk": bk, "fwd_ms": round(t_f * 1e3, 3),
                 "fwd_bwd_ms": round(t_b * 1e3, 3)}
            )
            print(json.dumps(results[-1]), flush=True)

    ok = [r for r in results if "error" not in r]
    best = min(ok, key=lambda r: r["fwd_bwd_ms"])
    print(json.dumps({
        "metric": "flash_block_sweep_best",
        "shape": [B, H, N, DH],
        "best": best,
        "default": next((r for r in ok if r["bq"] == 512 and r["bk"] == 1024), None),
    }), flush=True)


if __name__ == "__main__":
    main()
