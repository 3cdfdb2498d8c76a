"""Unit tests for the scale-out projection model
(tools/show_collectives.py --project): replica-group parsing, ring wire-byte
formulas, the pp utilization factor, and the degenerate no-collective case
(which is what makes the 1-chip projection == bench.py by construction —
the end-to-end few-% validation lives in BASELINE.md's round-5 row)."""

import pytest

from ucf_vit_tpu.tools.show_collectives import (
    _group_size,
    parse_collectives,
    project_step,
)


def test_group_size_explicit_and_iota():
    assert _group_size("{{0,1},{2,3}}") == 2
    assert _group_size("{{0,1,2,3,4,5,6,7}}") == 8
    assert _group_size("[4,8]<=[32]") == 8
    assert _group_size("[2,2]<=[4]{1,0}") == 2
    assert _group_size("") == 1


def test_parse_collectives_extracts_kind_bytes_groups():
    hlo = """
  %ag = f32[8,256] all-gather(f32[2,256] %p), replica_groups={{0,1,2,3}}, dimensions={0}
  %ar = bf16[128] all-reduce(bf16[128] %x), replica_groups=[2,4]<=[8], to_apply=%sum
  %cp = f32[16] collective-permute(f32[16] %y), source_target_pairs={{0,1}}
"""
    ops = parse_collectives(hlo)
    kinds = [(k, g) for k, _, g, _ in ops]
    assert ("all-gather", 4) in kinds
    assert ("all-reduce", 4) in kinds
    # permute has no replica_groups attr -> group 1; bytes still parsed
    cp = [o for o in ops if o[0] == "collective-permute"][0]
    assert cp[1] == 16 * 4 and cp[2] == 1
    ag = [o for o in ops if o[0] == "all-gather"][0]
    assert ag[1] == 8 * 256 * 4


def test_parse_tuple_collective():
    """XLA fuses the whole grad tree into ONE tuple-shaped all-reduce whose
    shape list intersperses /*index=N*/ comments — the round-4 parser
    dropped these entirely (the pure-ddp inventory read as zero
    collectives)."""
    hlo = ("  %all-reduce.216 = (f32[768]{0}, f32[768,4]{1,0}, "
           "/*index=2*/f32[2304]{0}) all-reduce(f32[768]{0} %a, "
           "f32[768,4]{1,0} %b, f32[2304]{0} %c), channel_id=1, "
           "replica_groups=[1,8]<=[8], to_apply=%add")
    ops = parse_collectives(hlo)
    assert len(ops) == 1
    kind, nbytes, gsize, _ = ops[0]
    assert kind == "all-reduce"
    assert gsize == 8
    # result tuple shapes only (operands live inside the call parens)
    assert nbytes == (768 + 768 * 4 + 2304) * 4


def test_project_no_collectives_degenerates_to_compute():
    p = project_step([], "v5e-8", step_ms=40.0)
    assert p["comm_ms"] == 0.0
    assert p["no_overlap_ms"] == p["full_overlap_ms"] == 40.0


def test_project_ring_formulas():
    # one 90 MB f32 all-gather over 4 chips at 45 GB/s: wire = 90*(3/4) MB
    ops = [("all-gather", 90e6, 4, "")]
    p = project_step(ops, "v5e-8", step_ms=10.0)
    wire = 90e6 * 3 / 4
    assert p["comm_mb"] == pytest.approx(wire / 1e6)
    assert p["comm_ms"] == pytest.approx(wire / 45e9 * 1e3)
    # all-reduce doubles the ring pass
    p2 = project_step([("all-reduce", 90e6, 4, "")], "v5e-8", step_ms=10.0)
    assert p2["comm_mb"] == pytest.approx(2 * wire / 1e6)
    # group size 1 contributes nothing
    p3 = project_step([("all-reduce", 90e6, 1, "")], "v5e-8", step_ms=10.0)
    assert p3["comm_ms"] == 0.0


def test_project_counts_collective_permutes():
    """Permutes carry source_target_pairs, never replica_groups, so they
    parse as group size 1 — but every hop moves its payload. pp stage hops,
    ring-attention rotations, and conv halo exchanges must NOT project to
    zero comm (the review catch on the first version of this model)."""
    p = project_step([("collective-permute", 90e6, 1, "")], "v5e-8",
                     step_ms=10.0)
    assert p["comm_mb"] == pytest.approx(90.0)
    assert p["comm_ms"] == pytest.approx(90e6 / 45e9 * 1e3)


def test_project_pp_utilization_factor():
    # S=4 stages, M=16 microbatches: per-chip compute = step/4 * 19/16
    p = project_step([], "v4-32", step_ms=100.0,
                     pipe_stages=4, pipe_microbatches=16)
    assert p["compute_ms"] == pytest.approx(100.0 / 4 * 19 / 16)


def test_overlap_bounds_ordering():
    ops = [("all-reduce", 500e6, 8, "")]
    p = project_step(ops, "v5e-8", step_ms=5.0)
    assert p["full_overlap_ms"] <= p["no_overlap_ms"]
    assert p["full_overlap_ms"] == max(p["compute_ms"], p["comm_ms"])


@pytest.mark.slow
def test_project_cli_end_to_end():
    """The full CLI wiring on the cheapest shipped config (catsdogs,
    world 1): compiles, inventories, and prints a PROJECTION line whose
    degenerate 1-chip projection equals the given step time exactly.
    Subprocess because force_virtual_cpu must run before any backend
    initializes (the test conftest already booted 8 CPU devices)."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(root, "configs/catsdogs/classification/base_config.yaml")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    proc = subprocess.run(
        [sys.executable, "-m", "ucf_vit_tpu.tools.show_collectives",
         cfg, "--project", "v5e-8", "--step-ms", "100"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr[-2000:]}"
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("PROJECTION ")][0]
    proj = json.loads(line[len("PROJECTION "):])
    assert proj["comm_ms"] == 0.0
    assert proj["no_overlap_ms"] == proj["full_overlap_ms"] == 100.0
