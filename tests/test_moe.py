"""Mixture-of-Experts + expert parallelism tests (models/moe.py).

Capability-plus over the reference (SURVEY.md §2.5: "PP / EP / CP — absent
entirely"). Strategy mirrors the TP tests: dense-math oracles for the
routing algebra, then sharded-vs-single-device equivalence on the ep mesh
axis, then an end-to-end train step through the task registry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models import VIT
from ucf_vit_tpu.models.blocks import Mlp
from ucf_vit_tpu.models.moe import MoeMlp, collect_moe_aux, expert_capacity
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.parallel import make_mesh
from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    TrainState,
    create_sharded_train_state,
    make_train_step,
    unbox,
)
from ucf_vit_tpu.utils.metrics import cross_entropy
from ucf_vit_tpu.utils.optim import configure_optimizer


def _x(b=2, n=16, d=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, n, d)), jnp.float32
    )


def test_single_expert_matches_dense_mlp():
    """E=1, k=1, capacity == N: the router gates with probability 1 and every
    token fits, so MoeMlp must reproduce the dense Mlp exactly."""
    d, h = 8, 16
    x = _x(d=d)
    dense = Mlp(hidden_features=h, out_features=d, gelu_approx=True)
    pd = dense.init(jax.random.key(0), x)
    moe = MoeMlp(
        dim=d, hidden_features=h, num_experts=1, top_k=1, capacity_factor=1.0
    )
    pm = unbox(moe.init(jax.random.key(1), x))
    k = unbox(pd)["params"]
    pm["params"]["wi"] = k["fc1"]["kernel"][None]
    pm["params"]["bi"] = k["fc1"]["bias"][None]
    pm["params"]["wo"] = k["fc2"]["kernel"][None]
    pm["params"]["bo"] = k["fc2"]["bias"][None]
    out_moe, _ = moe.apply({"params": pm["params"]}, x, mutable="moe")
    out_dense = dense.apply(pd, x)
    np.testing.assert_allclose(
        np.asarray(out_moe), np.asarray(out_dense), rtol=1e-5, atol=1e-6
    )


def test_top2_matches_dense_oracle():
    """With capacity >= N (no drops), the routed output must equal the dense
    computation sum_k gate_k * expert_{idx_k}(token) done token by token."""
    d, h, e = 8, 16, 4
    x = _x(b=2, n=8, d=d, seed=3)
    moe = MoeMlp(
        dim=d, hidden_features=h, num_experts=e, top_k=2,
        capacity_factor=float(e),  # capacity = N: nothing can drop
    )
    pm = moe.init(jax.random.key(0), x)
    out, _ = moe.apply({"params": pm["params"]}, x, mutable="moe")

    p = unbox(pm)["params"]
    logits = np.einsum("bnd,de->bne", np.asarray(x), np.asarray(p["router_kernel"]))
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    gates, idx = jax.lax.top_k(probs, 2)
    gates = np.asarray(gates / gates.sum(-1, keepdims=True))
    idx = np.asarray(idx)

    def expert(eid, tok):
        hdn = tok @ np.asarray(p["wi"])[eid] + np.asarray(p["bi"])[eid]
        hdn = np.asarray(jax.nn.gelu(jnp.asarray(hdn), approximate=True))
        return hdn @ np.asarray(p["wo"])[eid] + np.asarray(p["bo"])[eid]

    want = np.zeros_like(np.asarray(out))
    for b in range(x.shape[0]):
        for n in range(x.shape[1]):
            tok = np.asarray(x)[b, n]
            for kk in range(2):
                want[b, n] += gates[b, n, kk] * expert(idx[b, n, kk], tok)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_capacity_overflow_drops_in_sequence_order():
    """Force every token onto expert 0 with capacity C < N: exactly the first
    C tokens (sequence-order priority) produce MLP output, the rest zero."""
    d, h, e, n = 8, 16, 2, 8
    x = _x(b=1, n=n, d=d, seed=5)
    moe = MoeMlp(
        dim=d, hidden_features=h, num_experts=e, top_k=1, capacity_factor=0.5
    )
    pm = unbox(moe.init(jax.random.key(0), x))
    # router that always picks expert 0 regardless of input
    rk = np.zeros((d, e), np.float32)
    pm["params"]["router_kernel"] = jnp.asarray(rk)  # ties -> argmax = 0
    c = expert_capacity(n, e, 1, 0.5)  # = 2
    out, _ = moe.apply({"params": pm["params"]}, x, mutable="moe")
    out = np.asarray(out)
    assert np.abs(out[0, :c]).max() > 0, "kept tokens must get expert output"
    np.testing.assert_allclose(out[0, c:], 0.0, atol=1e-7)


def test_aux_loss_balanced_router_is_one():
    """Identical logits: every token's top-1 is expert 0, P is uniform ->
    Switch aux = E * (1 * 1/E) = 1 exactly."""
    d = 8
    x = _x(d=d, seed=7)
    moe = MoeMlp(dim=d, hidden_features=16, num_experts=4, top_k=1)
    pm = unbox(moe.init(jax.random.key(0), x))
    pm["params"]["router_kernel"] = jnp.zeros((d, 4), jnp.float32)
    _, mut = moe.apply({"params": pm["params"]}, x, mutable="moe")
    aux = collect_moe_aux(mut)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def _moe_vit(scan=False):
    return VIT(
        img_size=(16, 16),
        patch_size=8,
        in_chans=3,
        num_classes=4,
        embed_dim=16,
        depth=2,
        num_heads=2,
        default_vars=("v",),
        attn_impl=AttnImpl.EINSUM,
        moe_num_experts=4,
        moe_top_k=2,
        moe_every=1,
        scan_layers=scan,
    )


def _loss_fn(model, moe_w=0.01):
    def loss_fn(params, batch, rng):
        logits, mut = model.apply({"params": params}, batch["x"], mutable="moe")
        return cross_entropy(logits, batch["y"]) + moe_w * collect_moe_aux(mut)

    return loss_fn


@pytest.mark.parametrize("ddp,ep,fsdp,tp,scan", [
    (1, 2, 2, 2, False),
    (2, 4, 1, 1, True),
])
def test_ep_sharded_matches_single_device(ddp, ep, fsdp, tp, scan):
    """Expert-parallel training on the mesh must track the single-device run
    step for step — the dispatch/combine einsums reshard over ep without
    changing the math."""
    model = _moe_vit(scan=scan)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 3, 16, 16)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 4, size=(8,))),
    }
    loss_fn = _loss_fn(model)
    params_shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), batch["x"])
    )["params"]
    tx = configure_optimizer(params_shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    params0 = unbox(model.init(jax.random.key(0), batch["x"])["params"])
    step = make_train_step(loss_fn, tx, donate=False)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params0, opt_state=tx.init(params0)
    )
    losses_ref = []
    for i in range(3):
        state0, loss, _ = step(state0, batch, jax.random.key(i))
        losses_ref.append(float(loss))

    mesh = make_mesh(
        simple_ddp_size=ddp, fsdp_size=fsdp, tensor_par_size=tp,
        expert_par_size=ep,
    )
    with mesh_context(mesh):
        state, _ = create_sharded_train_state(
            lambda: model.init(jax.random.key(0), batch["x"]), tx, mesh
        )
        sbatch = shard_batch(mesh, batch)
        sstep = make_train_step(loss_fn, tx, donate=False)
        losses = []
        for i in range(3):
            state, loss, _ = sstep(state, sbatch, jax.random.key(i))
            losses.append(float(loss))
    np.testing.assert_allclose(losses, losses_ref, rtol=2e-4, atol=2e-5)

    # the stacked expert weights must actually shard over ep
    names_and_leaves = jax.tree.flatten_with_path(state.params)[0]
    expert_leaves = [
        l for path, l in names_and_leaves
        if any(getattr(p, "key", "") in ("wi", "wo") for p in path)
    ]
    assert expert_leaves, "no expert weights found in params"
    assert any(
        not l.sharding.is_fully_replicated for l in expert_leaves
    ), "expert weights are not sharded over ep"


def test_moe_task_registry_train_step():
    """classification task with MoE through the real config surface: loss is
    finite and expert weights receive gradient."""
    from ucf_vit_tpu.config import Config
    from ucf_vit_tpu.tasks import build_task

    raw = {
        "trainer": {"task": "classification", "max_epochs": 1},
        "parallelism": {"expert_par_size": 1},
        "model": {"net": {"init_args": {
            "default_vars": ["v"], "tile_size": [16, 16], "patch_size": 8,
            "embed_dim": 16, "depth": 2, "num_heads": 2, "twoD": True,
            "adaptive_patching": False, "num_classes": 4,
            "moe_num_experts": 4, "moe_top_k": 2, "moe_every": 1,
        }}},
        "data": {"num_classes": 4, "single_channel": True},
    }
    cfg = Config(raw=raw, task="classification")
    model, loss_fn = build_task(cfg)
    rng = np.random.default_rng(1)
    batch = {
        "x": jnp.asarray(rng.normal(size=(4, 3, 16, 16)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, size=(4,))),
    }
    params = unbox(
        model.init({"params": jax.random.key(0)}, batch["x"])["params"]
    )
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.key(1)
    )
    assert np.isfinite(float(loss))
    g = grads["blocks_0"]["moe_mlp"]
    assert any(
        float(jnp.abs(leaf).max()) > 0 for leaf in jax.tree.leaves(g)
    ), "no gradient reached the expert weights"
