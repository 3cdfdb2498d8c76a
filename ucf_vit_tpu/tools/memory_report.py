"""Per-step HBM memory report from AOT compilation — no device memory used.

Production batch-size tuning usually happens by trial-and-OOM; on TPU the
compiler already knows the answer. This tool lowers the REAL jitted train
step (same `make_train_step` the trainer runs, same remat/accum/EMA config)
against abstract `ShapeDtypeStruct` inputs and reads XLA's buffer
assignment (`compiled.memory_analysis()`): parameters, optimizer state,
activations/temp, and peak HBM — before allocating a single byte. Sweep
batch sizes to find the largest that fits a chip.

Capability-plus: the reference has no memory tooling (its OOM guidance is
"reduce the batch size", `README.md`).

Usage:
  python -m ucf_vit_tpu.tools.memory_report <config.yaml> [--batch N ...]
         [--hbm-gb 16] [--no-donate] [--json]
  python -m ucf_vit_tpu.tools.memory_report <config.yaml> --sharded [--json]

--sharded compiles the config's FULL sharded train step on a virtual CPU
mesh of exactly the device count `parallelism:` asks for (the same shared
harness the config-compile CI guard uses, tools/compile_harness.py) and
reports that executable's per-participant buffer assignment — the mode that
answers pipeline/FSDP memory questions, e.g. the round-5 GPipe-buffer-dtype
measurement (BASELINE.md pp-memory row).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(tree)
    )


def _fmt(n: int) -> str:
    if n >= 1 << 30:
        return f"{n / (1 << 30):.2f} GiB"
    if n >= 1 << 20:
        return f"{n / (1 << 20):.1f} MiB"
    return f"{n / (1 << 10):.1f} KiB"


def analyze(cfg, batch: Optional[int] = None, donate: bool = True) -> dict:
    """Compile the config's train step at `batch` and return the HBM budget.

    Everything is abstract: `jax.eval_shape` for the state, ShapeDtypeStructs
    for the batch, AOT `.lower().compile()` for the step — the report is
    exact (it IS the executable's buffer assignment) yet runs on any host."""
    from ucf_vit_tpu.parallel.train_step import TrainState, make_train_step, unbox
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch
    from ucf_vit_tpu.utils.optim import configure_optimizer

    if batch is not None:
        cfg.raw["data"]["batch_size"] = int(batch)
    batch = cfg.batch_size
    model, loss_fn = build_task(cfg)
    ex = example_batch(cfg, batch)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    def init_fn():
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "mask": jax.random.key(2)}
        return unbox(_init_variables(model, rngs, cfg, ex, var_ids)["params"])

    params_abs = jax.eval_shape(init_fn)
    mcfg = cfg.model
    tx = configure_optimizer(
        params_abs,
        lr=float(mcfg.get("lr", 1e-4)),
        warmup_steps=int(mcfg.get("warmup_steps", 100)),
        max_steps=int(mcfg.get("max_steps", 10000)),
        weight_decay=float(mcfg.get("weight_decay", 0.0)),
    )
    # mirror create_sharded_train_state exactly: the EMA copy and the loss-
    # scale scalar are live buffers in the real step (a params-sized f32
    # tree for EMA — omitting it under-reported peak HBM, round-3 review)
    from ucf_vit_tpu.utils.optim import init_loss_scale

    use_ema = cfg.trainer.get("ema_decay") is not None
    use_scaler = bool(mcfg.get("use_grad_scaler", False))
    state_abs = jax.eval_shape(
        lambda p: TrainState(
            step=jnp.zeros((), jnp.int32),
            params=p,
            opt_state=tx.init(p),
            loss_scale=init_loss_scale(8192.0) if use_scaler else None,
            ema_params=p if use_ema else None,
        ),
        params_abs,
    )
    batch_abs = {
        # canonicalize (int64 -> int32 under default x64-off) so the
        # accounting matches what jit actually receives
        k: jax.ShapeDtypeStruct(
            np.shape(v), jax.dtypes.canonicalize_dtype(np.asarray(v).dtype)
        )
        for k, v in ex.items() if isinstance(v, np.ndarray)
    }
    rng_abs = jax.eval_shape(lambda: jax.random.key(0))

    accum = int(cfg.trainer.get("accum_steps", 1))
    step = make_train_step(
        lambda p, b, r: loss_fn(p, b, r, var_ids=var_ids), tx,
        donate=donate, accum_steps=accum,
        ema_decay=cfg.trainer.get("ema_decay"),
    )
    base = {
        "batch_size": batch,
        "accum_steps": accum,
        "params_bytes": _bytes(params_abs),
        "opt_state_bytes": _bytes(state_abs.opt_state),
        "batch_bytes": _bytes(list(batch_abs.values())),
    }
    try:
        compiled = step.lower(state_abs, batch_abs, rng_abs).compile()
    except Exception as e:  # TPU compile rejects programs that exceed HBM
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
            return {**base, "compile_oom": True,
                    "error": msg.splitlines()[0][:200]}
        raise
    ma = compiled.memory_analysis()

    report = {
        **base,
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "donated_alias_bytes": int(ma.alias_size_in_bytes),
        "peak_hbm_bytes": int(ma.peak_memory_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
    }
    return report


def analyze_sharded(cfg) -> dict:
    """Compile the FULL sharded train step (virtual mesh sized from the
    config's `parallelism:`) and report its buffer assignment. The caller
    must have pointed jax at enough devices (main does, via
    force_virtual_cpu); batch is the true global batch, per the harness."""
    from ucf_vit_tpu.tools.compile_harness import compile_sharded_train_step

    compiled, mesh = compile_sharded_train_step(cfg)
    ma = compiled.memory_analysis()
    return {
        "mesh": dict(mesh.shape),
        "global_batch": cfg.batch_size * cfg.data_par_size,
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "peak_hbm_bytes": int(ma.peak_memory_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
    }


def print_report(rep: dict, hbm_gb: float):
    hbm = int(hbm_gb * (1 << 30))
    if rep.get("compile_oom"):
        print(
            f"batch {rep['batch_size']} (accum {rep['accum_steps']}): "
            f"DOES NOT FIT — the compiler rejected the program "
            f"(compile-time OOM: {rep['error']})"
        )
        return
    print(
        f"batch {rep['batch_size']} (accum {rep['accum_steps']}): "
        f"peak HBM {_fmt(rep['peak_hbm_bytes'])}"
        f" = args {_fmt(rep['argument_bytes'])}"
        f" (params {_fmt(rep['params_bytes'])}"
        f" + opt {_fmt(rep['opt_state_bytes'])}"
        f" + batch {_fmt(rep['batch_bytes'])})"
        f" + temp/activations {_fmt(rep['temp_bytes'])}"
        f"; donated-alias {_fmt(rep['donated_alias_bytes'])}"
    )
    frac = rep["peak_hbm_bytes"] / hbm
    verdict = "fits" if frac < 0.95 else "DOES NOT FIT"
    print(f"  -> {frac * 100:.1f}% of {hbm_gb:g} GiB/chip: {verdict}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="train-step HBM report")
    parser.add_argument("config")
    parser.add_argument("--task", default=None)
    parser.add_argument("--batch", type=int, nargs="*", default=None,
                        help="batch size(s) to analyze (default: config's)")
    parser.add_argument("--hbm-gb", type=float, default=16.0,
                        help="per-chip HBM budget (v5e=16, v4=32, v5p=95)")
    parser.add_argument("--no-donate", action="store_true",
                        help="disable buffer donation (shows the alias win)")
    # what-if overrides: answer "would it fit with ..." without editing the
    # config (the usual OOM escape hatches, in cost order)
    parser.add_argument("--remat", action="store_true",
                        help="what-if: trainer.remat (activation ckpt)")
    parser.add_argument("--bf16", action="store_true",
                        help="what-if: trainer.data_type bfloat16")
    parser.add_argument("--accum", type=int, default=None,
                        help="what-if: trainer.accum_steps N")
    parser.add_argument("--sharded", action="store_true",
                        help="compile the full sharded step on a virtual "
                             "mesh sized from parallelism: and report it")
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args(argv)

    from ucf_vit_tpu.config import load_config

    cfg = load_config(args.config, task=args.task)
    if args.remat:
        cfg.raw["trainer"]["remat"] = True
    if args.bf16:
        cfg.raw["trainer"]["data_type"] = "bfloat16"
    if args.accum is not None:
        cfg.raw["trainer"]["accum_steps"] = int(args.accum)
    if args.sharded:
        from ucf_vit_tpu.tools.compile_harness import (
            config_world, force_virtual_cpu,
        )

        force_virtual_cpu(config_world(cfg.raw.get("parallelism", {})))
        rep = analyze_sharded(cfg)
        if args.as_json:
            print(json.dumps(rep))
        else:
            print(
                f"mesh {rep['mesh']} global batch {rep['global_batch']}: "
                f"peak {_fmt(rep['peak_hbm_bytes'])} = args "
                f"{_fmt(rep['argument_bytes'])} + temp {_fmt(rep['temp_bytes'])}"
            )
        return
    for b in (args.batch or [None]):
        rep = analyze(cfg, batch=b, donate=not args.no_donate)
        if args.as_json:
            print(json.dumps(rep))
        else:
            print_report(rep, args.hbm_gb)


if __name__ == "__main__":
    main()
