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
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)  # fresh partitioning
import jax
jax.config.update("jax_platforms", "cpu")

from ucf_vit_tpu.config import load_config

cfg_path = sys.argv[1]
cfg = load_config(cfg_path)
par = cfg.raw.get("parallelism", {})
world = 1
for k in ("simple_ddp_size", "fsdp_size", "seq_par_size", "tensor_par_size",
          "pipe_par_size", "expert_par_size"):
    world *= int(par.get(k, 1))
jax.config.update("jax_num_cpu_devices", max(world, 1))
try:
    from jax._src import xla_bridge as _xb
    _xb._clear_backends()
except Exception:
    pass
assert jax.device_count() == max(world, 1)

import jax.numpy as jnp
import numpy as np
from ucf_vit_tpu.parallel.mesh import mesh_context, mesh_from_config, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    create_sharded_train_state, make_train_step,
)
from ucf_vit_tpu.tasks import build_task
from ucf_vit_tpu.train import _init_variables, example_batch
from ucf_vit_tpu.utils.optim import configure_optimizer

mesh = mesh_from_config(par)
model, loss_fn = build_task(cfg)
# the TRUE training-time global batch (train.py:331): compiling a smaller
# stand-in batch partitions differently (a 64-sample batch over 8 data
# shards microbatched by 16 is not the program the 512-sample run lowers)
ex = example_batch(cfg, cfg.batch_size * cfg.data_par_size)
arrays = {k: jnp.asarray(v) for k, v in ex.items() if isinstance(v, np.ndarray)}
var_ids = (model.get_var_ids(ex["variables"])
           if cfg.init_args.get("use_varemb", False) else None)

from ucf_vit_tpu.parallel.train_step import (
    TrainState, _rebox_opt_state, logical_state_sharding, unbox,
)
from ucf_vit_tpu.parallel.mesh import batch_sharding

with mesh_context(mesh):
    def init_fn():
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "mask": jax.random.key(2)}
        return _init_variables(model, rngs, cfg, ex, var_ids)

    shapes = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(shapes, lr=1e-4, warmup_steps=10, max_steps=100)

    def make_state():
        variables = init_fn()
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(unbox(params)),
        )

    state_shapes = jax.eval_shape(make_state)
    state_shapes = state_shapes.replace(
        opt_state=_rebox_opt_state(state_shapes.opt_state, state_shapes.params)
    )
    sharding = logical_state_sharding(state_shapes, mesh)
    abstract_state = jax.tree.map(
        lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
        unbox(state_shapes), unbox(sharding),
    )
    abstract_batch = {
        k: jax.ShapeDtypeStruct(
            v.shape, v.dtype, sharding=batch_sharding(mesh, v.ndim)
        )
        for k, v in arrays.items()
    }
    step = make_train_step(
        lambda p, b, r: loss_fn(p, b, r, var_ids=var_ids), tx, donate=False
    )
    compiled = step.lower(
        abstract_state, abstract_batch, jax.random.key(0)
    ).compile()
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
