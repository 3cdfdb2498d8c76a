"""UNETR 3D training-step benchmark on the shipped config.

The pipeline-fed measurement (BASELINE r3) showed the shipped bs=2 UNETR
config is compute-bound at ~7 samples/s; this bench isolates the train
step itself and sweeps the batch size to find the chip's sweet spot —
the reference hard-codes bs=2 (`configs/basic_ct/unetr/base_config.yaml`)
with no published rationale.

Usage: python benchmarks/bench_unetr_train.py [--remat] [batch ...]
       (default sweep: 2 4 8; --remat checkpoints blocks + conv decoder,
        trading recompute for the activation memory that caps bs at 2)
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


STEPS = 10
WARMUP = 2


def bench_batch(cfg_path: str, batch: int, remat: bool = False) -> dict:
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.parallel.train_step import (
        TrainState,
        make_train_step,
        unbox,
    )
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, synthetic_batches
    from ucf_vit_tpu.utils.optim import configure_optimizer

    import jax.numpy as jnp
    import numpy as np

    cfg = load_config(cfg_path)
    cfg.raw["data"]["batch_size"] = batch
    if remat:
        cfg.raw["trainer"]["remat"] = True
    model, loss_fn = build_task(cfg)
    b = next(synthetic_batches(cfg, batch))
    arrays = {k: jnp.asarray(v) for k, v in b.items() if isinstance(v, np.ndarray)}

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2)}
    params = unbox(_init_variables(model, rngs, cfg, b, None)["params"])
    tx = configure_optimizer(params, lr=1e-4, warmup_steps=100, max_steps=10000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = make_train_step(lambda p, bb, r: loss_fn(p, bb, r, var_ids=None),
                           tx, donate=False)

    for i in range(WARMUP):
        state, loss, _ = step(state, arrays, jax.random.key(i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, arrays, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0
    return {
        "batch": batch,
        "ms_per_step": round(dt / STEPS * 1e3, 2),
        "samples_per_s": round(batch * STEPS / dt, 2),
    }


def main():
    cfg_path = "configs/basic_ct/unetr/base_config.yaml"
    argv = sys.argv[1:]
    remat = "--remat" in argv
    batches = [int(a) for a in argv if a != "--remat"] or [2, 4, 8]
    rows = []
    for bs in batches:
        r = bench_batch(cfg_path, bs, remat=remat)
        r["remat"] = remat
        rows.append(r)
        print(json.dumps(r), flush=True)
    best = max(rows, key=lambda r: r["samples_per_s"])
    print(json.dumps({
        "metric": "unetr3d_train_samples_per_sec_per_chip",
        "value": best["samples_per_s"],
        "unit": "samples/s/chip",
        "best_batch": best["batch"],
        "remat": remat,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
