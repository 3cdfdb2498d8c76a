"""Generic training-step benchmark: any shipped config, batch-size sweep.

Measures the jitted train step (fwd + bwd + AdamW) in isolation on whatever
single accelerator is attached, on synthetic batches of the config's exact
shapes. Completes the per-architecture throughput table: the dedicated
scripts cover classification (bench.py), MAE (bench_mae*.py), UNETR
(bench_unetr_train.py), and MoE (bench_moe.py); this one gives SAP and
DiffusionVIT — or any future config — the same measurement without another
copy of the harness. The reference publishes no per-architecture numbers
at all (BASELINE.md "published: {}").

Usage: python benchmarks/bench_train_step.py <config.yaml> [--remat] [--bf16]
       [--accum N] [bs ...]
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


def bench_batch(cfg_path: str, batch: int, remat: bool = False,
                bf16: bool = False, accum: int = 1) -> dict:
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
    if bf16:
        # The shipped basic_ct/diffusion configs keep the reference's
        # simple-mode float32 (its simple scripts assert f32 because that
        # mode has no MixedPrecision wiring — a limitation, not a workload
        # requirement). This framework's dtype policy works for every task;
        # --bf16 measures the capability row.
        cfg.raw["trainer"]["data_type"] = "bfloat16"
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
                           tx, donate=False, accum_steps=accum)

    # Executed-FLOP count straight from XLA's cost analysis of the compiled
    # step (VERDICT r3 #6: every benchmark row needs an MFU denominator).
    # Unlike the hand-counted matmul formulas in bench.py/bench_mae.py this
    # covers convs (UNETR/SAP decoders) and every fused op; with --remat the
    # recomputed FLOPs ARE counted, so remat rows report hardware FLOP
    # utilization rather than the stricter model-FLOP convention.
    step_flops = step_bytes = None
    try:
        if accum > 1:
            # XLA's cost analysis counts a lax.scan body ONCE regardless of
            # trip count (verified: bs=32 --accum 2 reports the same flops as
            # bs=16 --accum 1), so lowering the accum step under-reports by
            # ~accum x. Probe a single-microbatch accum=1 step and scale.
            # This over-counts the optimizer update (accum-1) extra times --
            # O(params) elementwise ops, negligible against fwd+bwd GEMMs --
            # and the same caveat applies to the (already pre-fusion) bytes.
            assert batch % accum == 0
            micro = jax.tree.map(lambda a: a[: batch // accum], arrays)
            probe = make_train_step(
                lambda p, bb, r: loss_fn(p, bb, r, var_ids=None),
                tx, donate=False, accum_steps=1)
            lowered = probe.lower(state, micro, jax.random.key(0))
            scale = accum
        else:
            lowered = step.lower(state, arrays, jax.random.key(0))
            scale = 1
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0)) * scale or None
        step_bytes = float(ca.get("bytes accessed", 0.0)) * scale or None
    except Exception:
        pass

    for i in range(WARMUP):
        state, loss, _ = step(state, arrays, jax.random.key(i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, arrays, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0
    out = {
        "batch": batch,
        "ms_per_step": round(dt / STEPS * 1e3, 2),
        "samples_per_s": round(batch * STEPS / dt, 2),
        "params_m": round(n_params / 1e6, 1),
    }
    if step_flops:
        from bench import peak_flops

        mfu = step_flops * STEPS / dt / peak_flops(jax.devices()[0])
        out["tflops_per_step"] = round(step_flops / 1e12, 3)
        out["self_mfu"] = round(mfu, 4)
    if step_bytes:
        # XLA cost-model bytes are PRE-fusion (every op's operands+outputs),
        # so this over-counts real HBM traffic — util > 1 just means fusion
        # keeps much of it on-chip. It is still the right scale check for
        # conv-decoder workloads (UNETR) whose low self-MFU comes from being
        # bandwidth-bound, not MXU-bound. v5e HBM peak: 819 GB/s.
        bw = step_bytes * STEPS / dt
        out["cost_gbytes_per_step"] = round(step_bytes / 1e9, 2)
        out["cost_bytes_over_hbm_peak"] = round(bw / 819e9, 4)
    return out


def main():
    argv = sys.argv[1:]
    assert argv, "usage: bench_train_step.py <config.yaml> [--remat] [bs ...]"
    cfg_path = argv[0]
    remat = "--remat" in argv
    bf16 = "--bf16" in argv
    accum = 1
    rest = []
    it = iter(argv[1:])
    for a in it:
        if a == "--accum":
            v = next(it, None)
            assert v is not None and not v.startswith("--"), (
                "--accum needs an integer value, e.g. --accum 2"
            )
            accum = int(v)
        elif a not in ("--remat", "--bf16"):
            rest.append(a)
    batches = [int(a) for a in rest] or [2, 4, 8]
    name = cfg_path.rstrip("/").split("configs/")[-1].replace(
        "/", "_").removesuffix(".yaml").removesuffix("_base_config")
    rows = []
    for bs in batches:
        try:
            r = bench_batch(cfg_path, bs, remat=remat, bf16=bf16, accum=accum)
        except Exception as e:  # OOM at the top of a sweep is a result
            print(json.dumps({"batch": bs, "error": str(e)[:200]}), flush=True)
            continue
        r["remat"] = remat
        r["dtype"] = "bf16" if bf16 else "config"
        r["accum"] = accum
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
