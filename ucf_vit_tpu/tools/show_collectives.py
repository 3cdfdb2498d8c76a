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

    # virtual CPU devices sized to the config's world, then the SAME
    # AOT sharded-compile construction as the trainer/compile guard —
    # including the TRUE global batch (batch_size x data_par_size); a
    # smaller stand-in batch partitions differently and its collective
    # inventory would not be the training program's
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.tools.compile_harness import (
        compile_sharded_train_step,
        config_world,
        force_virtual_cpu,
    )

    cfg = load_config(args.config, task=args.task)
    world = config_world(cfg.raw.get("parallelism", {}))
    force_virtual_cpu(world)
    compiled, mesh = compile_sharded_train_step(cfg)
    hlo = compiled.as_text()

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
