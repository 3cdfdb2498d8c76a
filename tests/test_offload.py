"""Optimizer-state host offload mechanism (study artifact).

The streaming formulation — moments in pinned_host between steps, in-jit
device_put roundtrip during the update — is numerically exact but was
REJECTED as a product knob on chip measurements (BASELINE.md round 3): peak
HBM +0.9 GiB and +148%/step at ViT-L, because XLA keeps both moment copies
live across the transfers; compute_on('device_host') crashes this rig's
remote compiler; and the CPU backend DEADLOCKS executing the roundtrip
program (pxla __call__ never returns) — one more reason no config knob
ships. Placement/creation work on every backend and are tested here; step
execution is gated to a real accelerator (see
test_offload_step_numerics, exercised by benchmarks/bench_offload.py on
the chip, where 10 steps offload-vs-device produced identical losses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _leaf_kinds(tree):
    return {
        x.sharding.memory_kind
        for x in jax.tree.leaves(tree)
        if hasattr(x, "sharding")
    }


def _tiny_setup():
    import flax.linen as nn
    import optax

    from ucf_vit_tpu.parallel import make_mesh

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            return nn.Dense(4)(nn.gelu(x))

    model = Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)), jnp.float32)
    tx = optax.adamw(1e-2)
    mesh = make_mesh(1, 1, 1, 1)

    def init_fn():
        return model.init(jax.random.key(0), x)

    def loss_fn(params, batch, rng):
        pred = model.apply({"params": params}, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2)

    return model, x, y, tx, mesh, init_fn, loss_fn


def test_offload_sharding_metadata():
    """offload_opt_sharding rewrites every opt-state sharding to pinned
    host with the PartitionSpec preserved."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.train_step import offload_opt_sharding

    mesh = make_mesh(1, 1, 1, 1)
    tree = {
        "mu": NamedSharding(mesh, P("fsdp")),
        "count": NamedSharding(mesh, P()),
    }
    out = offload_opt_sharding(tree)
    assert all(s.memory_kind == "pinned_host" for s in jax.tree.leaves(out))
    assert out["mu"].spec == tree["mu"].spec
    assert out["count"].spec == tree["count"].spec


def test_offload_state_creation_placement():
    """create_sharded_train_state(offload_opt=True): moments land in
    pinned_host; params stay in device memory. (Creation + the outside-jit
    transfer work on every backend — only step execution needs a real
    accelerator.)"""
    from ucf_vit_tpu.parallel.mesh import mesh_context
    from ucf_vit_tpu.parallel.train_step import create_sharded_train_state

    model, x, y, tx, mesh, init_fn, loss_fn = _tiny_setup()
    with mesh_context(mesh):
        state, sharding = create_sharded_train_state(
            init_fn, tx, mesh, offload_opt=True
        )
    assert _leaf_kinds(state.opt_state) == {"pinned_host"}
    assert "pinned_host" not in _leaf_kinds(state.params)
    assert all(
        s.memory_kind == "pinned_host"
        for s in jax.tree.leaves(sharding.opt_state)
    )


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="the CPU runtime deadlocks executing device<->pinned_host "
    "roundtrip programs (part of why the knob does not ship); the chip "
    "path is exercised by benchmarks/bench_offload.py",
)
def test_offload_step_numerics():
    """3 steps offload vs on-device on a real accelerator: identical
    params, moments stay host-resident across steps."""
    from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )

    model, x, y, tx, mesh, init_fn, loss_fn = _tiny_setup()
    results = {}
    for offload in (False, True):
        with mesh_context(mesh):
            state, _ = create_sharded_train_state(
                init_fn, tx, mesh, offload_opt=offload
            )
            step = make_train_step(loss_fn, tx, offload_opt=offload)
            batch = shard_batch(mesh, {"x": x, "y": y})
            for i in range(3):
                state, loss, _ = step(state, batch, jax.random.key(i))
            if offload:
                assert _leaf_kinds(state.opt_state) == {"pinned_host"}
            results[offload] = (
                jax.tree.map(np.asarray, state.params), float(loss)
            )
    p_dev, l_dev = results[False]
    p_off, l_off = results[True]
    assert l_dev == l_off, (l_dev, l_off)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), p_dev, p_off
    )
