"""Compile shipped configs' SHARDED train steps on their own virtual meshes.

Round 4 found that `configs/imagenet/classification_vit_l_pp` — shipped
since round 2 — had never actually been compiled: its bf16 x pp combination
CHECK-failed inside XLA, and nothing in CI compiles a shipped config's full
sharded program (test_configs builds models; the dryrun/spmd guard compile
tiny stand-ins). This closes that class of bug for the configs that
exercise distinct parallelism machinery:

  vit_l_pp  — pp=4 x ddp=2 x fsdp=4, bf16, remat (the one that was broken)
  moe       — ep=4 expert parallelism, routed-MLP dispatch einsums
  mae_long  — sp=4 sequence parallelism (ring attention config)
  mae       — the flagship ddp path with grad scaler wiring

Each case spawns a fresh subprocess (its own virtual device count + clean
compile state) and must COMPILE the full sharded train step (AOT, abstract
state — big configs like mae_long would need hundreds of GB to actually
execute a 128^3 step on a CPU host) with zero "Involuntary full
rematerialization" partitioner warnings. Execution coverage comes from the
dryrun and the tiny-model equivalence tests.
"""

import os
import subprocess
import sys

import pytest

CASES = [
    "configs/imagenet/classification_vit_l_pp/base_config.yaml",
    "configs/imagenet/classification_moe/base_config.yaml",
    "configs/basic_ct/mae_long/base_config.yaml",
    "configs/basic_ct/mae/base_config.yaml",
]

BODY = r"""
import sys

from ucf_vit_tpu.config import load_config
from ucf_vit_tpu.tools.compile_harness import (
    compile_sharded_train_step, config_world, force_virtual_cpu,
)

cfg = load_config(sys.argv[1])
force_virtual_cpu(config_world(cfg.raw.get("parallelism", {})))
compiled, _ = compile_sharded_train_step(cfg)
assert compiled is not None
print("CONFIG_COMPILE_OK", flush=True)
"""


@pytest.mark.slow
@pytest.mark.parametrize("cfg", CASES, ids=[c.split("/")[-2] for c in CASES])
def test_shipped_config_compiles_sharded(cfg, tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "compile_one.py"
    script.write_text(BODY)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    proc = subprocess.run(
        [sys.executable, str(script), os.path.join(root, cfg)],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    assert proc.returncode == 0, (
        f"{cfg} failed to compile/execute:\n{proc.stdout[-1500:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    assert "CONFIG_COMPILE_OK" in proc.stdout
    bad = [l for l in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in l]
    assert not bad, f"{cfg}: {len(bad)} involuntary reshards. First:\n{bad[0]}"
