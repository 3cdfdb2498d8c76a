"""Inventory the collectives a config's training step compiles to.

Compiles the FULL sharded train step (same construction as the trainer) for
the config's `parallelism:` mesh on virtual CPU devices — no pod needed —
then parses the optimized HLO and prints every communication op with its
shape, byte size, and replica grouping. Ends with a per-kind summary
(count, total bytes moved per step).

This is the pre-flight check for a scale-out plan: before buying pod time,
confirm the program contains exactly the collectives the sharding design
predicts (e.g. fsdp -> per-layer all-gather/reduce-scatter, tp -> per-block
all-reduces, ep -> one a2a pair per MoE layer, pp -> neighbor
collective-permutes) and nothing pathological (all-to-alls where you
expected none, giant all-gathers from an involuntary reshard — the
round-3 dryrun's failure mode, now also guarded by
tests/test_spmd_resharding.py).

The reference has no equivalent — its communication schedule is implicit
in NCCL calls scattered through torch FSDP internals and hand-written
autograd functions (`utils/dist_functions.py`).

Usage:
  python -m ucf_vit_tpu.tools.show_collectives <config.yaml>
         [--task T] [--all] (default: summary only; --all lists every op)
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

# collective HLO opcode -> short role note
KINDS = {
    "all-reduce": "grad/activation reduction (ddp/fsdp grads, tp activations)",
    "all-gather": "param gather (fsdp) / KV gather (sp)",
    "reduce-scatter": "sharded grad reduction (fsdp)",
    "all-to-all": "Ulysses head<->seq swap (sp) / MoE dispatch (ep)",
    "collective-permute": "pipeline stage hop (pp) / ring attention (sp)",
    "collective-broadcast": "replication",
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(shape_str: str) -> int:
    """'f32[4,256,768]{...}' -> byte count (tuples handled upstream)."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def parse_collectives(hlo: str) -> list:
    """[(kind, bytes, groups, line)] for every collective op in the HLO."""
    out = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"%?\S+\s*=\s*(\(?[a-z0-9]+\[[^=]*?)\s*("
                     + "|".join(KINDS) + r")(-start|-done)?\(", ls)
        if not m or (m.group(3) == "-done"):
            continue
        shapes_part, kind = m.group(1), m.group(2)
        nbytes = sum(
            _shape_bytes(s) for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]", shapes_part)
        )
        gm = re.search(r"replica_groups=(\{[^}]*\}\}?|\[[^\]]*\][^,]*)", ls)
        groups = gm.group(1)[:60] if gm else ""
        out.append((kind, nbytes, groups, ls[:200]))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--task", default=None)
    ap.add_argument("--all", action="store_true", help="list every op")
    args = ap.parse_args(argv)

    # virtual CPU devices sized to the config's world (before jax init)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from ucf_vit_tpu.config import load_config

    cfg = load_config(args.config, task=args.task)
    par = cfg.raw.get("parallelism", {})
    world = 1
    for k in ("simple_ddp_size", "fsdp_size", "seq_par_size",
              "tensor_par_size", "pipe_par_size", "expert_par_size"):
        world *= int(par.get(k, 1))
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(world, 1))
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from ucf_vit_tpu.parallel.mesh import mesh_context, mesh_from_config, shard_batch
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch
    from ucf_vit_tpu.utils.optim import configure_optimizer

    mesh = mesh_from_config(par)
    model, loss_fn = build_task(cfg)
    ex = example_batch(cfg, max(cfg.batch_size, world))
    arrays = {k: jnp.asarray(v) for k, v in ex.items() if isinstance(v, np.ndarray)}
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    with mesh_context(mesh):
        def init_fn():
            rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                    "mask": jax.random.key(2)}
            return _init_variables(model, rngs, cfg, ex, var_ids)

        shapes = jax.eval_shape(init_fn)["params"]
        tx = configure_optimizer(shapes, lr=1e-4, warmup_steps=10, max_steps=100)
        state, _ = create_sharded_train_state(init_fn, tx, mesh)
        sbatch = shard_batch(mesh, arrays)
        step = make_train_step(
            lambda p, b, r: loss_fn(p, b, r, var_ids=var_ids), tx, donate=False
        )
        hlo = step.lower(state, sbatch, jax.random.key(0)).compile().as_text()

    ops = parse_collectives(hlo)
    mesh_desc = " x ".join(
        f"{a}={mesh.shape[a]}" for a in mesh.axis_names if mesh.shape[a] > 1
    ) or "1 device"
    print(f"mesh: {mesh_desc}   ({world} devices, virtual CPU compile)")
    print(f"collectives in one train step: {len(ops)}\n")
    by_kind = defaultdict(lambda: [0, 0])
    for kind, nbytes, groups, line in ops:
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
        if args.all:
            print(f"  {kind:20s} {nbytes/1e6:9.3f} MB  {groups}")
    for kind in KINDS:
        if kind in by_kind:
            c, b = by_kind[kind]
            print(f"{kind:22s} x{c:<4d} {b/1e6:10.2f} MB/step   # {KINDS[kind]}")
    if not ops:
        print("(no collectives — single-device program)")


if __name__ == "__main__":
    main()
