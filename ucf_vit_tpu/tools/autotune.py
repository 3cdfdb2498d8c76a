"""Batch-size / remat autotuner driven by AOT compilation.

Finds the largest per-chip batch a config fits in HBM — and optionally the
FASTEST one — without a single trial-and-OOM run. The fit search is pure
compiler arithmetic: each candidate lowers the real jitted train step (same
`make_train_step` the trainer runs) against abstract shapes and reads XLA's
buffer assignment (`tools/memory_report.analyze`), so it works on any host,
no TPU needed. `--measure` then times the real step on the attached device
at the fitting candidates, because the biggest batch is usually NOT the
fastest (the v5e ViT-B sweet spot is microbatch 24 with grad accumulation,
BASELINE.md — XLA tiles some large batches poorly).

Capability-plus: the reference has no tooling here (its OOM guidance is
"reduce the batch size", `README.md`; its configs hard-code batch sizes with
no rationale, e.g. UNETR bs=2 — which `trainer.remat` lifts to 8, BASELINE.md).

Usage:
  python -m ucf_vit_tpu.tools.autotune <config.yaml> [--hbm-gb 16]
         [--max-batch 4096] [--try-remat] [--measure [--steps 8]] [--json]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

from ucf_vit_tpu.tools.memory_report import _fmt, analyze

# Stay under the budget: XLA's buffer assignment is exact for the step, but
# the runtime keeps a few percent for infeed/outfeed and fragmentation.
FIT_FRACTION = 0.95


def _fits(rep: dict, hbm_bytes: int) -> bool:
    if rep.get("compile_oom"):
        return False
    return rep["peak_hbm_bytes"] <= FIT_FRACTION * hbm_bytes


def find_max_batch(
    cfg,
    hbm_bytes: int,
    max_batch: int = 4096,
    donate: bool = True,
    verbose: bool = False,
) -> tuple[int, dict, dict]:
    """Largest batch whose compiled train step fits `hbm_bytes`.

    Doubling probe from 1, then binary search the bracket — O(log max_batch)
    AOT compiles, zero device memory. Returns (best_batch, best_report,
    all_reports_by_batch); best_batch is 0 when even batch 1 does not fit.
    """
    reports: dict = {}

    def probe(b: int) -> bool:
        rep = analyze(cfg, batch=b, donate=donate)
        reports[b] = rep
        if verbose:
            peak = ("compile-OOM" if rep.get("compile_oom")
                    else _fmt(rep["peak_hbm_bytes"]))
            print(f"  probe batch {b}: peak {peak} -> "
                  f"{'fits' if _fits(rep, hbm_bytes) else 'does not fit'}",
                  flush=True)
        return _fits(rep, hbm_bytes)

    lo = 0  # largest known-fitting batch
    b = 1
    while b <= max_batch and probe(b):
        lo = b
        b *= 2
    if lo == 0:
        return 0, reports.get(1, {}), reports
    hi = min(b, max_batch + 1)  # smallest known-non-fitting (or cap+1)
    # binary search (lo fits, hi does not — or hi is past the cap)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if mid == lo or mid in reports:
            break
        if probe(mid):
            lo = mid
        else:
            hi = mid
    return lo, reports[lo], reports


def measure_throughput(cfg, batch: int, steps: int = 8, warmup: int = 2) -> float:
    """Samples/s of the real train step at `batch` on the attached device.

    Same state/step construction as the trainer (synthetic batch contents —
    throughput does not depend on pixel values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucf_vit_tpu.parallel.train_step import TrainState, make_train_step, unbox
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch
    from ucf_vit_tpu.utils.optim import configure_optimizer, init_loss_scale

    cfg.raw["data"]["batch_size"] = int(batch)
    model, loss_fn = build_task(cfg)
    ex = example_batch(cfg, batch)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2)}
    params = unbox(_init_variables(model, rngs, cfg, ex, var_ids)["params"])
    mcfg = cfg.model
    tx = configure_optimizer(
        params,
        lr=float(mcfg.get("lr", 1e-4)),
        warmup_steps=int(mcfg.get("warmup_steps", 100)),
        max_steps=int(mcfg.get("max_steps", 10000)),
        weight_decay=float(mcfg.get("weight_decay", 0.0)),
    )
    use_scaler = bool(mcfg.get("use_grad_scaler", False))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        loss_scale=init_loss_scale(8192.0) if use_scaler else None,
        ema_params=params if cfg.trainer.get("ema_decay") is not None else None,
    )
    accum = int(cfg.trainer.get("accum_steps", 1))
    step = make_train_step(
        lambda p, b, r: loss_fn(p, b, r, var_ids=var_ids), tx,
        donate=False, accum_steps=accum,
        ema_decay=cfg.trainer.get("ema_decay"),
    )
    dev_batch = {k: v for k, v in ex.items() if isinstance(v, np.ndarray)}
    for i in range(warmup):
        state, loss, _ = step(state, dev_batch, jax.random.key(i))
    float(loss)  # hard sync
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, _ = step(state, dev_batch, jax.random.key(i))
    float(loss)
    return batch * steps / (time.perf_counter() - t0)


def autotune(
    cfg_path: str,
    task: Optional[str] = None,
    hbm_gb: float = 16.0,
    max_batch: int = 4096,
    try_remat: bool = False,
    measure: bool = False,
    steps: int = 8,
    verbose: bool = True,
) -> dict:
    """Tune one config: max fitting batch (and remat variant), optionally
    timed. Returns {variants: {name: {...}}, recommendation: {...}}."""
    from ucf_vit_tpu.config import load_config

    hbm_bytes = int(hbm_gb * (1 << 30))
    variants = {"base": {}}
    if try_remat and not bool(load_config(cfg_path, task=task).trainer.get(
            "remat", False)):
        variants["remat"] = {"trainer.remat": True}

    out: dict = {"hbm_gb": hbm_gb, "variants": {}}
    for name, overrides in variants.items():
        cfg = load_config(cfg_path, task=task)
        for key, val in overrides.items():
            section, k = key.split(".", 1)
            cfg.raw[section][k] = val
        if verbose:
            print(f"variant '{name}' (overrides {overrides or 'none'}):",
                  flush=True)
        best, rep, reports = find_max_batch(
            cfg, hbm_bytes, max_batch=max_batch, verbose=verbose
        )
        entry = {
            "overrides": overrides,
            "max_batch": best,
            "peak_hbm_bytes": (0 if best == 0 else rep["peak_hbm_bytes"]),
        }
        if measure and best > 0:
            # the fastest batch is often below the max (BASELINE.md): time
            # the max and each fitting power-of-two below it
            candidates = sorted(
                {b for b in reports
                 if b <= best and _fits(reports[b], hbm_bytes)} | {best}
            )
            timed = {}
            for b in candidates:
                cfg_m = load_config(cfg_path, task=task)
                for key, val in overrides.items():
                    section, k = key.split(".", 1)
                    cfg_m.raw[section][k] = val
                sps = measure_throughput(cfg_m, b, steps=steps)
                timed[b] = round(sps, 2)
                if verbose:
                    print(f"  measure batch {b}: {sps:.1f} samples/s",
                          flush=True)
            entry["samples_per_s"] = timed
            entry["best_batch"] = max(timed, key=timed.get)
        out["variants"][name] = entry

    def score(e):  # prefer measured throughput, else capacity
        if "samples_per_s" in e:
            return e["samples_per_s"][e["best_batch"]]
        return e["max_batch"]

    winner = max(out["variants"].items(), key=lambda kv: score(kv[1]))
    rec = {"variant": winner[0], **winner[1]["overrides"],
           "data.batch_size": winner[1].get(
               "best_batch", winner[1]["max_batch"])}
    out["recommendation"] = rec
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="AOT batch-size / remat autotuner"
    )
    parser.add_argument("config")
    parser.add_argument("--task", default=None)
    parser.add_argument("--hbm-gb", type=float, default=16.0,
                        help="per-chip HBM budget (v5e=16, v4=32, v5p=95)")
    parser.add_argument("--max-batch", type=int, default=4096)
    parser.add_argument("--try-remat", action="store_true",
                        help="also tune a trainer.remat=true variant")
    parser.add_argument("--measure", action="store_true",
                        help="time the real step on the device at fitting "
                             "batches (biggest is often not fastest)")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args(argv)

    out = autotune(
        args.config, task=args.task, hbm_gb=args.hbm_gb,
        max_batch=args.max_batch, try_remat=args.try_remat,
        measure=args.measure, steps=args.steps, verbose=not args.as_json,
    )
    if args.as_json:
        print(json.dumps(out))
    else:
        rec = out["recommendation"]
        extras = {k: v for k, v in rec.items() if k != "variant"}
        print(f"recommendation: variant '{rec['variant']}' -> "
              + ", ".join(f"{k}: {v}" for k, v in extras.items()))


if __name__ == "__main__":
    main()
