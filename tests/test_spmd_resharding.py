"""Compile-time guard against SPMD involuntary full rematerialization.

Round 3's 8-device dryrun compiled with "[SPMD] Involuntary full
rematerialization" warnings on the MoE dispatch/combine einsums and the
pipelined-MAE microbatch reshape — full-tensor reshards paid every step on a
real pod. The fixes (models/moe.py dot-natural dispatch order + activation
logical_constraint actually firing via parallel/mesh.py logical_constraint;
see that module's _ACTIVE_MESH comment) are guarded here: the ep and pp
training steps are compiled in a fresh subprocess (the partitioner warning
is emitted once per compilation, so the in-process compile cache would mask
it) and stderr must contain zero such warnings.
"""

import os
import subprocess
import sys

import pytest

WARN = "Involuntary full rematerialization"


@pytest.mark.slow
def test_no_involuntary_remat_ep_pp():
    script = os.path.join(os.path.dirname(__file__), "spmd_guard_main.py")
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, (
        f"spmd guard subprocess failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
    assert "SPMD_GUARD_DONE" in proc.stdout
    bad = [l for l in proc.stderr.splitlines() if WARN in l]
    assert not bad, (
        "SPMD partitioner fell back to replicate-then-repartition "
        f"({len(bad)} warnings). First:\n{bad[0]}"
    )
