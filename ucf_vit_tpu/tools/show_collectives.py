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
         [--project v4-32|v5e-8|... --step-ms <measured single-chip ms>]

--project turns the inventory into a projected per-step time on a target
topology (round 5): ring-model wire bytes per chip over one ICI link's
one-way bandwidth vs the measured compute term, reported as
[full overlap .. no overlap] bounds with the assumptions printed — the
honest substitute for pod benches a 1-chip rig cannot run, falsifiable
the day real hardware appears. See BASELINE.md round 5 for the shipped
projections (classification, mae, vit_l_pp, mae_long, moe).
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


def _group_size(groups: str) -> int:
    """Participant count per replica group from an HLO replica_groups
    attribute. Handles both the explicit form `{{0,1},{2,3}}` (-> 2) and
    the iota form `[4,8]<=[32]` (last dim of the group shape -> 8).
    Unparseable/empty -> 1 (no communication)."""
    if not groups:
        return 1
    m = re.match(r"\[([0-9,]+)\]<=", groups)
    if m:
        dims = [int(d) for d in m.group(1).split(",") if d]
        return dims[-1] if dims else 1
    m = re.search(r"\{([0-9, ]+)\}", groups)
    if m:
        return len([t for t in m.group(1).split(",") if t.strip()])
    return 1


def parse_collectives(hlo: str) -> list:
    """[(kind, bytes, group_size, line)] for every collective op in the HLO.

    `bytes` is the RESULT size (gathered size for all-gather, shard size
    for reduce-scatter, full size for all-reduce/a2a/permute) — the
    projection model converts per kind."""
    out = []
    for line in hlo.splitlines():
        ls = line.strip()
        # shapes part is lazy `.*?`: tuple-shaped collectives (one fused
        # all-reduce over many grad leaves) intersperse `/*index=N*/`
        # comments through the shape list — a `[^=]*` there silently
        # dropped every tuple collective (round-5 parser fix)
        m = re.match(r"%?\S+\s*=\s*(\(?.*?)\s*("
                     + "|".join(KINDS) + r")(-start|-done)?\(", ls)
        if not m or (m.group(3) == "-done"):
            continue
        shapes_part, kind = m.group(1), m.group(2)
        nbytes = sum(
            _shape_bytes(s) for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]", shapes_part)
        )
        gm = re.search(r"replica_groups=(\{[^}]*\}\}?|\[[^\]]*\][^,]*)", ls)
        groups = gm.group(1) if gm else ""
        out.append((kind, nbytes, _group_size(groups), ls[:200]))
    return out


# --------------------------------------------------------------------------
# Scale-out projection (round 5 — VERDICT r4 item 4): turn the per-step
# collective inventory into a projected step time per topology. The honest
# substitute for multi-chip benches a 1-chip rig cannot run, and falsifiable
# the day real hardware appears.
#
# Model (all assumptions printed with the result):
#   compute term — the measured single-chip step time for this config's
#     per-chip share of work (`--step-ms`, from bench.py /
#     benchmarks/bench_train_step.py; weak scaling: per-chip batch constant).
#     For pp configs the full-model step is divided across S stages and
#     multiplied by the GPipe utilization factor (M+S-1)/M.
#   comm term — per collective, ring-algorithm bytes-on-the-wire per chip
#     divided by ONE ICI link's one-way bandwidth (conservative: XLA can
#     stripe a collective across a torus's multiple links/axes; DCN hops are
#     NOT modeled — the projection is per-slice).
#   overlap — both bounds reported: none (compute + comm) and full
#     (max(compute, comm)); XLA's latency-hiding scheduler lands in between.
# --------------------------------------------------------------------------

# name -> (chips, ICI one-way GB/s per link). Public per-generation figures;
# edit here to recalibrate projections.
TOPOLOGIES = {
    "v5e-8": (8, 45.0),
    "v5e-16": (16, 45.0),
    "v5e-32": (32, 45.0),
    "v4-8": (8, 45.0),
    "v4-32": (32, 45.0),
    "v5p-8": (8, 90.0),
    "v5p-32": (32, 90.0),
}

# kind -> bytes each chip puts on the wire, given parsed RESULT bytes B and
# group size N (ring algorithms)
_WIRE_BYTES = {
    "all-gather": lambda b, n: b * (n - 1) / max(n, 1),      # B = gathered
    "reduce-scatter": lambda b, n: b * (n - 1),              # B = shard
    "all-reduce": lambda b, n: 2.0 * b * (n - 1) / max(n, 1),
    "all-to-all": lambda b, n: b * (n - 1) / max(n, 1),
    "collective-permute": lambda b, n: float(b),             # one hop
    "collective-broadcast": lambda b, n: float(b),
}


def project_step(ops, topology: str, step_ms: float,
                 pipe_stages: int = 1, pipe_microbatches: int = 1) -> dict:
    """Projected per-step time on `topology` given the collective inventory
    `ops` (from parse_collectives) and the measured single-chip `step_ms`."""
    chips, link_gbps = TOPOLOGIES[topology]
    comm_ms = 0.0
    comm_bytes = 0.0
    for kind, nbytes, gsize, _ in ops:
        # collective-permutes carry source_target_pairs, never
        # replica_groups, so they always parse as group size 1 — but every
        # hop moves its full payload (pp stage hops, ring-attention
        # rotations, conv halo exchanges are EXACTLY the permute-dominated
        # programs this projection exists for)
        if gsize <= 1 and kind != "collective-permute":
            continue
        wire = _WIRE_BYTES.get(kind, lambda b, n: float(b))(nbytes, gsize)
        comm_bytes += wire
        comm_ms += wire / (link_gbps * 1e9) * 1e3
    s, m = max(pipe_stages, 1), max(pipe_microbatches, 1)
    if s > 1:
        compute_ms = step_ms / s * (m + s - 1) / m
    else:
        compute_ms = step_ms
    return {
        "topology": topology,
        "chips": chips,
        "link_gbps": link_gbps,
        "compute_ms": compute_ms,
        "comm_ms": comm_ms,
        "comm_mb": comm_bytes / 1e6,
        "no_overlap_ms": compute_ms + comm_ms,
        "full_overlap_ms": max(compute_ms, comm_ms),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--task", default=None)
    ap.add_argument("--all", action="store_true", help="list every op")
    ap.add_argument("--project", metavar="TOPO", default=None,
                    choices=sorted(TOPOLOGIES),
                    help="project step time onto a topology "
                         f"({', '.join(sorted(TOPOLOGIES))})")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured single-chip step time (ms) for the "
                         "compute term of --project")
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
    for kind, nbytes, gsize, line in ops:
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
        if args.all:
            print(f"  {kind:20s} {nbytes/1e6:9.3f} MB  groups of {gsize}")
    for kind in KINDS:
        if kind in by_kind:
            c, b = by_kind[kind]
            print(f"{kind:22s} x{c:<4d} {b/1e6:10.2f} MB/step   # {KINDS[kind]}")
    if not ops:
        print("(no collectives — single-device program)")

    if args.project:
        assert args.step_ms is not None, (
            "--project needs --step-ms <measured single-chip step ms> "
            "(bench.py / benchmarks/bench_train_step.py)"
        )
        par = cfg.raw.get("parallelism", {})
        if TOPOLOGIES[args.project][0] != world:
            print(
                f"\nNOTE: config compiles for a {world}-device mesh but "
                f"{args.project} has {TOPOLOGIES[args.project][0]} chips — "
                "the projection models the config's own mesh on that "
                "generation's ICI links"
            )
        pp = int(par.get("pipe_par_size", 1))
        m = int(par.get("pipe_microbatches", 0))
        if pp > 1 and m <= 0:
            # resolve the documented auto value (0) exactly as the trainer
            # does, else the bubble factor degenerates to worst-case M=1
            from ucf_vit_tpu.parallel.pipeline import pick_microbatches

            m = pick_microbatches(
                cfg.batch_size * cfg.data_par_size, pp,
                data_extent=cfg.data_par_size,
            )
        proj = project_step(
            ops, args.project, args.step_ms,
            pipe_stages=pp, pipe_microbatches=m,
        )
        print(
            f"\nprojection on {proj['topology']} ({proj['chips']} chips, "
            f"{proj['link_gbps']:.0f} GB/s/link one-way ICI):\n"
            f"  compute/chip {proj['compute_ms']:8.2f} ms"
            f"   (measured single-chip {args.step_ms:.2f} ms"
            + (f", pp utilization folded in)" if int(
                par.get("pipe_par_size", 1)) > 1 else ")")
            + f"\n  comm/chip    {proj['comm_ms']:8.2f} ms"
            f"   ({proj['comm_mb']:.1f} MB on the wire, 1-link ring model)\n"
            f"  step bounds  {proj['full_overlap_ms']:8.2f} ms (full overlap)"
            f" .. {proj['no_overlap_ms']:.2f} ms (no overlap)"
        )
        import json as _json

        print("PROJECTION " + _json.dumps(proj))


if __name__ == "__main__":
    main()
