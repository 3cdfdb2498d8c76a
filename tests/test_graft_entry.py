"""The driver-graded entry points must work in the DRIVER's environment,
not just under this test harness: a fresh interpreter where the axon
sitecustomize (or any default backend) has already won the platform choice
and `xla_force_host_platform_device_count` env tricks are overridden.

Round-1 regression: MULTICHIP_r01.json was ok=false because
dryrun_multichip never did the post-import CPU backend switch."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_fresh_interpreter():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # Simulate the driver: no JAX_PLATFORMS=cpu pre-set; whatever backend
    # the interpreter boots with is what dryrun_multichip must cope with.
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout
