"""Show how a config's parameters shard over its mesh — without devices.

Prints, per parameter: shape, dtype, the logical axis names flax recorded
at creation, the mesh PartitionSpec those names resolve to under
LOGICAL_RULES, and the resulting bytes/device for the config's
`parallelism:` sizes. Ends with totals (params, bytes, bytes/device) and a
replicated-vs-sharded breakdown. Everything is derived from
`jax.eval_shape` + the logical rules, so it runs on any host with zero
devices — the tool to sanity-check a scale-out plan before touching a pod.

The reference has no equivalent (its sharding is implicit in FSDP wrapping
and hand-written TP modules).

Usage:
  python -m ucf_vit_tpu.tools.show_sharding <config.yaml> [--task T]
         [--all] (default shows one row per distinct sharding pattern)
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def collect(cfg) -> list:
    """[(path, shape, dtype, mesh_spec, shard_factor)] for every param."""
    import flax.linen as nn

    from ucf_vit_tpu.parallel.mesh import LOGICAL_RULES
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch

    model, _ = build_task(cfg)
    ex = example_batch(cfg, cfg.batch_size)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    def init_fn():
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "mask": jax.random.key(2)}
        return _init_variables(model, rngs, cfg, ex, var_ids)["params"]

    shapes = jax.eval_shape(init_fn)
    specs = jax.tree.map(
        lambda s: nn.logical_to_mesh_axes(s, LOGICAL_RULES),
        nn.get_partition_spec(shapes),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )

    par = dict(cfg.raw.get("parallelism", {}) or {})
    axis_size = {
        "pp": int(par.get("pipe_par_size", 1)),
        "ddp": int(par.get("simple_ddp_size", 1)),
        "ep": int(par.get("expert_par_size", 1)),
        "fsdp": int(par.get("fsdp_size", 1)),
        "sp": int(par.get("seq_par_size", 1)),
        "tp": int(par.get("tensor_par_size", 1)),
    }

    def axes_factor(entry) -> int:
        if entry is None:
            return 1
        names = entry if isinstance(entry, (tuple, list)) else (entry,)
        f = 1
        for n in names:
            f *= axis_size.get(n, 1)
        return f

    rows = []
    flat_shapes = jax.tree_util.tree_flatten_with_path(
        shapes, is_leaf=lambda x: hasattr(x, "shape")
    )[0]
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    assert len(flat_shapes) == len(flat_specs)
    for (path, leaf), spec in zip(flat_shapes, flat_specs):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        # unboxed leaves (no logical metadata) resolve to fully replicated
        spec = spec if isinstance(spec, jax.sharding.PartitionSpec) else (
            jax.sharding.PartitionSpec()
        )
        factor = 1
        for entry in spec:
            factor *= axes_factor(entry)
        rows.append((name, tuple(leaf.shape), str(leaf.dtype), spec, factor))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description="parameter sharding map")
    parser.add_argument("config")
    parser.add_argument("--task", default=None)
    parser.add_argument("--all", action="store_true",
                        help="one row per parameter (default: one row per "
                             "distinct sharding pattern)")
    args = parser.parse_args(argv)

    from ucf_vit_tpu.config import load_config

    cfg = load_config(args.config, task=args.task)
    rows = collect(cfg)

    total = sum(int(np.prod(s)) for _, s, _, _, _ in rows)
    total_bytes = sum(
        int(np.prod(s)) * np.dtype(d).itemsize for _, s, d, _, _ in rows
    )
    per_dev = sum(
        int(np.prod(s)) * np.dtype(d).itemsize // f
        for _, s, d, _, f in rows
    )
    sharded = [r for r in rows if r[4] > 1]

    if args.all:
        for name, shape, dtype, spec, f in rows:
            print(f"{name}: {shape} {dtype} spec={spec} shard_factor={f}")
    else:
        seen = {}
        for name, shape, dtype, spec, f in rows:
            key = (str(spec), f)
            seen.setdefault(key, [0, 0, name])
            seen[key][0] += 1
            seen[key][1] += int(np.prod(shape)) * np.dtype(dtype).itemsize
        for (spec, f), (n, b, example) in sorted(
            seen.items(), key=lambda kv: -kv[1][1]
        ):
            print(f"{n:4d} params, {b / (1 << 20):9.1f} MiB  spec={spec} "
                  f"shard_factor={f}  (e.g. {example})")

    print(
        f"\ntotal: {total / 1e6:.1f}M params, {total_bytes / (1 << 20):.1f} "
        f"MiB; per-device {per_dev / (1 << 20):.1f} MiB under the config's "
        f"mesh; {len(sharded)}/{len(rows)} tensors sharded"
    )


if __name__ == "__main__":
    main()
