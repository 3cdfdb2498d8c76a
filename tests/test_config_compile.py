"""Compile EVERY shipped config's SHARDED train step on its own virtual mesh.

Round 4 found that `configs/imagenet/classification_vit_l_pp` — shipped
since round 2 — had never actually been compiled: its bf16 x pp combination
CHECK-failed inside XLA, and nothing in CI compiles a shipped config's full
sharded program (test_configs builds models; the dryrun/spmd guard compile
tiny stand-ins). Round 5 extends the guard from the 4 parallelism-exercising
configs to ALL shipped configs (VERDICT r4 item 5: "the other 8 configs
still rely on indirect coverage").

Each GROUP of configs with the same device-world size shares one subprocess
(its own virtual device count + clean compile state); the heavy or
machinery-distinct configs keep dedicated subprocesses. Every config must
COMPILE its full sharded train step (AOT, abstract state — big configs like
mae_long would need hundreds of GB to actually execute a 128^3 step on a
CPU host) with zero "Involuntary full rematerialization" partitioner
warnings. Execution coverage comes from the dryrun and the tiny-model
equivalence tests.
"""

import glob
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# id -> list of configs compiled in ONE subprocess (same virtual world).
GROUPS = {
    # the round-4 machinery-distinct cases keep their own subprocesses
    "vit_l_pp": ["configs/imagenet/classification_vit_l_pp/base_config.yaml"],
    "moe": ["configs/imagenet/classification_moe/base_config.yaml"],
    "mae_long": ["configs/basic_ct/mae_long/base_config.yaml"],
    "mae": ["configs/basic_ct/mae/base_config.yaml"],
    "vit_l": ["configs/imagenet/classification_vit_l/base_config.yaml"],
    "unetr_sp": ["configs/basic_ct/unetr_sp/base_config.yaml"],
    # ddp-8 workhorses (world 8, cheap individually): one shared subprocess
    "w8_tasks": [
        "configs/imagenet/classification/base_config.yaml",
        "configs/imagenet/mae/base_config.yaml",
        "configs/imagenet/diffusion/base_config.yaml",
        "configs/basic_ct/diffusion/base_config.yaml",
        "configs/basic_ct/sap/base_config.yaml",
        "configs/basic_ct/sap_bf16/base_config.yaml",
        "configs/basic_ct/unetr/base_config.yaml",
    ],
    "catsdogs": ["configs/catsdogs/classification/base_config.yaml"],
}

BODY = r"""
import sys

from ucf_vit_tpu.config import load_config
from ucf_vit_tpu.tools.compile_harness import (
    compile_sharded_train_step, config_world, force_virtual_cpu,
)

paths = sys.argv[1:]
cfgs = [load_config(p) for p in paths]
worlds = {config_world(c.raw.get("parallelism", {})) for c in cfgs}
assert len(worlds) == 1, f"grouped configs disagree on world size: {worlds}"
force_virtual_cpu(worlds.pop())
for p, cfg in zip(paths, cfgs):
    compiled, _ = compile_sharded_train_step(cfg)
    assert compiled is not None
    print(f"CONFIG_COMPILE_OK {p}", flush=True)
"""


def test_every_shipped_config_is_guarded():
    """The GROUPS table must cover every configs/**/base_config.yaml —
    a newly shipped config that nobody adds here fails CI immediately
    (the r4 bf16 x pp bug was exactly a shipped-but-never-compiled config)."""
    shipped = {
        os.path.relpath(p, _ROOT)
        for p in glob.glob(os.path.join(_ROOT, "configs/**/base_config.yaml"),
                           recursive=True)
    }
    guarded = {c for group in GROUPS.values() for c in group}
    assert shipped == guarded, (
        f"unguarded shipped configs: {sorted(shipped - guarded)}; "
        f"stale guard entries: {sorted(guarded - shipped)}"
    )


@pytest.mark.slow
@pytest.mark.parametrize("group", GROUPS, ids=list(GROUPS))
def test_shipped_config_compiles_sharded(group, tmp_path):
    script = tmp_path / "compile_group.py"
    script.write_text(BODY)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [_ROOT] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    cfgs = GROUPS[group]
    proc = subprocess.run(
        [sys.executable, str(script)] + [os.path.join(_ROOT, c) for c in cfgs],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    assert proc.returncode == 0, (
        f"{group} failed to compile:\n{proc.stdout[-1500:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    for c in cfgs:
        assert f"CONFIG_COMPILE_OK {os.path.join(_ROOT, c)}" in proc.stdout, (
            f"{c}: no compile confirmation in output"
        )
    bad = [l for l in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in l]
    assert not bad, f"{group}: {len(bad)} involuntary reshards. First:\n{bad[0]}"
