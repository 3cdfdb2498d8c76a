"""Generic training-step benchmark: any shipped config, batch-size sweep.

Measures the jitted train step (fwd + bwd + AdamW) in isolation on whatever
single accelerator is attached, on synthetic batches of the config's exact
shapes. Completes the per-architecture throughput table: the dedicated
scripts cover classification (bench.py), MAE (bench_mae*.py), UNETR
(bench_unetr_train.py), and MoE (bench_moe.py); this one gives SAP and
DiffusionVIT — or any future config — the same measurement without another
copy of the harness. The reference publishes no per-architecture numbers
at all (BASELINE.md "published: {}").

Usage: python benchmarks/bench_train_step.py <config.yaml> [--remat] [bs ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, ".")

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
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
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
        "params_m": round(n_params / 1e6, 1),
    }


def main():
    argv = sys.argv[1:]
    assert argv, "usage: bench_train_step.py <config.yaml> [--remat] [bs ...]"
    cfg_path = argv[0]
    remat = "--remat" in argv
    batches = [int(a) for a in argv[1:] if a != "--remat"] or [2, 4, 8]
    name = cfg_path.rstrip("/").split("configs/")[-1].replace(
        "/", "_").removesuffix(".yaml").removesuffix("_base_config")
    rows = []
    for bs in batches:
        try:
            r = bench_batch(cfg_path, bs, remat=remat)
        except Exception as e:  # OOM at the top of a sweep is a result
            print(json.dumps({"batch": bs, "error": str(e)[:200]}), flush=True)
            continue
        r["remat"] = remat
        rows.append(r)
        print(json.dumps(r), flush=True)
    assert rows, "every batch size failed"
    best = max(rows, key=lambda r: r["samples_per_s"])
    print(json.dumps({
        "metric": f"{name}_train_samples_per_sec_per_chip",
        "value": best["samples_per_s"],
        "unit": "samples/s/chip",
        "best_batch": best["batch"],
        "remat": remat,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
