"""UNETR 3D adaptive segmentation inference throughput on one chip.

The reference's eval loop hard-codes batch_size=1
(`inference_unetr_simple.py:160`); this framework's jitted forward batches,
which is where TPU inference throughput comes from. Workload: the shipped
basic_ct UNETR config's model (ViT-B encoder, 64^3 tiles, adaptive
fixed_length 729, sqrt_len method) on synthetic data.

Usage: python benchmarks/bench_unetr_infer.py [batch_size]
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


STEPS = 20
WARMUP = 3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.tasks import build_task, _seq_ps, reassemble_sqrt_len
    from ucf_vit_tpu.train import example_batch, _init_variables
    from ucf_vit_tpu.parallel.train_step import unbox

    cfg = load_config("configs/basic_ct/unetr/base_config.yaml")
    model, _ = build_task(cfg)
    ex = example_batch(cfg, batch)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    params = unbox(_init_variables(model, rngs, cfg, ex, None)["params"])
    sqrt_len, p = cfg.sqrt_len, cfg.patch_size

    @jax.jit
    def forward(params, seq, x):
        seq_img = reassemble_sqrt_len(seq, sqrt_len, p, cfg.twoD)
        return model.apply({"params": params}, x, None, _seq_ps(ex), seq_img)

    seq = jnp.asarray(ex["seq"])
    x = jnp.asarray(ex["x"])
    for _ in range(WARMUP):
        out = forward(params, seq, x)
    float(jnp.sum(out.astype(jnp.float32)))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = forward(params, seq, x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    vps = batch * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "unetr3d_adaptive_inference_volumes_per_sec",
                "value": round(vps, 2),
                "unit": "volumes/s",
                "batch_size": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
