"""Shared virtual-CPU sharded-compile harness.

One implementation of the "compile a config's FULL sharded train step
without a pod" recipe, used by three callers that previously each carried
their own copy (and had already drifted on the global batch — see
compile_sharded_train_step):

  - tests/test_config_compile.py      — shipped-config compile guard
  - tests/spmd_guard_main.py          — tiny-model reshard-warning guard
  - ucf_vit_tpu/tools/show_collectives.py — the collective-inventory tool

The compile is AOT from ABSTRACT state (jax.ShapeDtypeStruct carrying the
logical shardings): nothing is ever materialized, so even configs whose
real state would need hundreds of GB lower in seconds on a 1-core host.
"""

from __future__ import annotations

import os
from typing import Optional

_PAR_KEYS = (
    "simple_ddp_size",
    "fsdp_size",
    "seq_par_size",
    "tensor_par_size",
    "pipe_par_size",
    "expert_par_size",
)


def config_world(par: dict) -> int:
    """Total device count a `parallelism:` section asks for."""
    world = 1
    for k in _PAR_KEYS:
        world *= int(par.get(k, 1))
    return max(world, 1)


def force_virtual_cpu(n_devices: int, fresh_cache: bool = True) -> None:
    """Re-point jax at ``n_devices`` virtual CPU devices.

    Must run before any computation touches a backend. ``fresh_cache``
    drops JAX_COMPILATION_CACHE_DIR so the SPMD partitioner actually runs
    (a cache hit would skip partitioning and silently skip its
    "Involuntary full rematerialization" warnings, which the guards
    assert on).
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    if fresh_cache:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass
    assert jax.device_count() == n_devices, (
        f"asked for {n_devices} virtual CPU devices, got {jax.device_count()}"
        " — a backend was already initialized before force_virtual_cpu()"
    )


def compile_sharded_train_step(cfg, batch_size: Optional[int] = None):
    """AOT-compile ``cfg``'s full sharded train step on the current devices.

    Returns ``(compiled, mesh)``. The batch defaults to the TRUE
    training-time global batch, ``cfg.batch_size * cfg.data_par_size``
    (train.py:331) — compiling a smaller stand-in partitions differently
    (a 64-sample batch over 8 data shards microbatched by 16 is not the
    program the 512-sample run lowers), which is exactly the drift this
    shared helper exists to prevent.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucf_vit_tpu.parallel.mesh import (
        batch_sharding,
        mesh_context,
        mesh_from_config,
    )
    from ucf_vit_tpu.parallel.train_step import (
        TrainState,
        _rebox_opt_state,
        logical_state_sharding,
        make_train_step,
        unbox,
    )
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch
    from ucf_vit_tpu.utils.optim import configure_optimizer

    par = cfg.raw.get("parallelism", {})
    mesh = mesh_from_config(par)
    model, loss_fn = build_task(cfg)
    if batch_size is None:
        batch_size = cfg.batch_size * cfg.data_par_size
    ex = example_batch(cfg, batch_size)
    arrays = {
        k: jnp.asarray(v) for k, v in ex.items() if isinstance(v, np.ndarray)
    }
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    with mesh_context(mesh):
        def init_fn():
            rngs = {
                "params": jax.random.key(0),
                "dropout": jax.random.key(1),
                "mask": jax.random.key(2),
            }
            return _init_variables(model, rngs, cfg, ex, var_ids)

        shapes = jax.eval_shape(init_fn)["params"]
        tx = configure_optimizer(shapes, lr=1e-4, warmup_steps=10,
                                 max_steps=100)

        def make_state():
            variables = init_fn()
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=tx.init(unbox(params)),
            )

        state_shapes = jax.eval_shape(make_state)
        state_shapes = state_shapes.replace(
            opt_state=_rebox_opt_state(
                state_shapes.opt_state, state_shapes.params
            )
        )
        sharding = logical_state_sharding(state_shapes, mesh)
        abstract_state = jax.tree.map(
            lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            unbox(state_shapes),
            unbox(sharding),
        )
        abstract_batch = {
            k: jax.ShapeDtypeStruct(
                v.shape, v.dtype, sharding=batch_sharding(mesh, v.ndim)
            )
            for k, v in arrays.items()
        }
        step = make_train_step(
            lambda p, b, r: loss_fn(p, b, r, var_ids=var_ids),
            tx,
            donate=False,
        )
        compiled = step.lower(
            abstract_state, abstract_batch, jax.random.key(0)
        ).compile()
    return compiled, mesh
