"""Per-chip cost-model traffic: UNETR pure-ddp vs spatially-partitioned sp.

The UNETR training row is HBM-bandwidth-bound (BASELINE.md r4: 332 GB
cost-model bytes/step single chip, 9.5% self-MFU), and both r4 rejected
studies attacked single-chip layout. This benchmark quantifies the
multi-chip lever instead (VERDICT r4 item 3): compile the shipped UNETR
workload's SHARDED train step as pure data-parallel (ddp=world) and as
ddp x sp (sp shards the decoder's first spatial dim + the encoder token
sequence where lengths divide) on the same virtual-device world, and
compare per chip and per SAMPLE-EQUIVALENT of work:

  - XLA cost-model "bytes accessed" of the per-device program (the same
    metric the r4 row used; CPU backend here — relative, not absolute,
    against the TPU row), and
  - the collective traffic sp adds (conv halo collective-permutes, sp
    all-gathers) that pure ddp does not pay.

The sp divisibility structure is the whole story at this workload:
fixed_length 729 = 3^6 tokens means the ENCODER sequence shards over
sp=3 but NOT sp=2 — at sp=2 each chip repeats full encoder work for its
ddp-shard's samples and only the decoder divides.

Usage: python benchmarks/bench_unetr_sp_cost.py [sp]   (default 2;
       world = 8 for sp=2, 2*sp otherwise)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucf_vit_tpu.config import load_config  # noqa: E402
from ucf_vit_tpu.tools.compile_harness import (  # noqa: E402
    compile_sharded_train_step,
    force_virtual_cpu,
)
from ucf_vit_tpu.tools.show_collectives import parse_collectives  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = "configs/basic_ct/unetr/base_config.yaml"


def main():
    sp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    world = 8 if sp == 2 else 2 * sp
    layouts = [
        (f"ddp{world}", {"simple_ddp_size": world}),
        (f"ddp{world // sp}xsp{sp}",
         {"simple_ddp_size": world // sp, "seq_par_size": sp}),
    ]
    force_virtual_cpu(world)

    rows = []
    shard_batch_size = None
    for name, par in layouts:
        cfg = load_config(os.path.join(ROOT, CONFIG))
        shard_batch_size = cfg.batch_size
        cfg.raw["parallelism"] = {
            "fsdp_size": 1, "tensor_par_size": 1, "seq_par_size": 1, **par
        }
        compiled, mesh = compile_sharded_train_step(cfg)
        cost = compiled.cost_analysis()
        bytes_chip = float(cost.get("bytes accessed", 0.0))
        global_batch = cfg.batch_size * cfg.data_par_size
        samples_chip = global_batch / world
        ops = parse_collectives(compiled.as_text())
        coll_mb = sum(b for _, b, _, _ in ops) / 1e6
        rows.append((name, global_batch, samples_chip,
                     bytes_chip / 1e9, bytes_chip / samples_chip / 1e9,
                     len(ops), coll_mb))

    print(f"world {world}, per-data-shard batch {shard_batch_size}")
    print(f"{'layout':10s} {'gbatch':>6s} {'smp/chip':>8s} "
          f"{'GB/chip/step':>13s} {'GB/chip/sample':>15s} "
          f"{'colls':>6s} {'coll MB':>9s}")
    for name, gb, spc, gchip, gsmp, nc, cmb in rows:
        print(f"{name:10s} {gb:6d} {spc:8.1f} {gchip:13.2f} "
              f"{gsmp:15.2f} {nc:6d} {cmb:9.1f}")

    base, spr = rows[0][4], rows[1][4]
    print(f"\nper-chip per-sample cost-model bytes: {rows[0][0]} {base:.2f} "
          f"GB -> {rows[1][0]} {spr:.2f} GB ({base / spr:.2f}x)")


if __name__ == "__main__":
    main()
