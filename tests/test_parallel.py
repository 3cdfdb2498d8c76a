"""Multi-device sharding tests on the 8-virtual-CPU mesh.

The capability the reference could never test without a cluster (SURVEY.md
§4): sharded-vs-single-device numerical equivalence (the reference's stated
reason for keeping simple/ alongside fsdp/, `README.md:963`), exercised
hybrid ddp x fsdp x tp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models import VIT
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.parallel import make_mesh
from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    create_sharded_train_state,
    make_train_step,
    unbox,
)
from ucf_vit_tpu.utils.metrics import cross_entropy
from ucf_vit_tpu.utils.optim import configure_optimizer


def _model():
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
    )


def _batch():
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.normal(size=(8, 3, 16, 16)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 4, size=(8,))),
    }


def _loss_fn(model):
    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch["x"])
        return cross_entropy(logits, batch["y"])

    return loss_fn


@pytest.mark.parametrize(
    "ddp,fsdp,sp,tp",
    [(8, 1, 1, 1), (2, 2, 1, 2), (1, 2, 1, 4)],
)
def test_sharded_matches_single_device(ddp, fsdp, sp, tp):
    model = _model()
    batch = _batch()
    loss_fn = _loss_fn(model)
    tx = configure_optimizer(
        jax.eval_shape(
            lambda: model.init(jax.random.key(0), batch["x"])
        )["params"],
        lr=1e-3,
        warmup_steps=2,
        max_steps=10,
    )

    # single-device reference run
    params0 = unbox(model.init(jax.random.key(0), batch["x"])["params"])
    step = make_train_step(loss_fn, tx, donate=False)
    from ucf_vit_tpu.parallel.train_step import TrainState

    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params0, opt_state=tx.init(params0)
    )
    losses_ref = []
    for i in range(3):
        state0, loss, _ = step(state0, batch, jax.random.key(i))
        losses_ref.append(float(loss))

    # sharded run on the mesh
    mesh = make_mesh(ddp, fsdp, sp, tp)
    with mesh_context(mesh):
        state, sharding = create_sharded_train_state(
            lambda: model.init(jax.random.key(0), batch["x"]), tx, mesh
        )
        sbatch = shard_batch(mesh, batch)
        sstep = make_train_step(loss_fn, tx, donate=False)
        losses = []
        for i in range(3):
            state, loss, _ = sstep(state, sbatch, jax.random.key(i))
            losses.append(float(loss))

    np.testing.assert_allclose(losses, losses_ref, rtol=2e-4, atol=2e-5)

    # params stay sharded: at least one leaf is not fully replicated when
    # fsdp/tp > 1
    if fsdp * tp > 1:
        leaves = jax.tree.leaves(state.params)
        assert any(
            not l.sharding.is_fully_replicated for l in leaves
        ), "expected sharded parameters"


def test_opt_state_inherits_param_shardings():
    """Adam mu/nu must shard like their params under fsdp>1 (ZeRO-3
    semantics; round-1 regression: tx.init on unboxed params left every
    moment leaf fully replicated)."""
    model = _model()
    batch = _batch()
    params_shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), batch["x"])
    )["params"]
    tx = configure_optimizer(params_shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    mesh = make_mesh(1, 4, 1, 2)
    with mesh_context(mesh):
        state, sharding = create_sharded_train_state(
            lambda: model.init(jax.random.key(0), batch["x"]), tx, mesh
        )
    param_leaves = jax.tree.leaves(state.params)
    sharded_params = [l for l in param_leaves if not l.sharding.is_fully_replicated]
    assert sharded_params, "model too small to shard — fix the fixture"
    # find the Adam moments inside opt_state: subtrees mirroring params
    mus = [
        s.mu
        for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert mus, "no ScaleByAdamState found in opt_state"
    mu = mus[0]
    mismatches = []
    for p, m in zip(jax.tree.leaves(state.params), jax.tree.leaves(mu)):
        if p.sharding != m.sharding:
            mismatches.append((p.shape, p.sharding, m.sharding))
    assert not mismatches, f"moment shardings differ from params: {mismatches[:3]}"


def test_loss_scale_step_runs_on_mesh():
    model = _model()
    batch = _batch()
    loss_fn = _loss_fn(model)
    params_shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), batch["x"])
    )["params"]
    tx = configure_optimizer(params_shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    mesh = make_mesh(2, 2, 1, 2)
    with mesh_context(mesh):
        state, _ = create_sharded_train_state(
            lambda: model.init(jax.random.key(0), batch["x"]),
            tx,
            mesh,
            use_grad_scaler=True,
        )
        sbatch = shard_batch(mesh, batch)
        sstep = make_train_step(loss_fn, tx, donate=False)
        state, loss, _ = sstep(state, sbatch, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert float(state.loss_scale.scale) == 8192.0


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 over batch 8 == single step over batch 8 (same loss,
    equivalent update) for a deterministic loss."""
    from ucf_vit_tpu.parallel.train_step import TrainState

    model = _model()
    batch = _batch()
    loss_fn = _loss_fn(model)
    params0 = unbox(model.init(jax.random.key(0), batch["x"])["params"])
    tx = configure_optimizer(params0, lr=1e-3, warmup_steps=2, max_steps=10)

    def run(accum):
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params0,
            opt_state=tx.init(params0),
        )
        step = make_train_step(loss_fn, tx, donate=False, accum_steps=accum)
        losses = []
        for i in range(2):
            state, loss, _ = step(state, batch, jax.random.key(i))
            losses.append(float(loss))
        return losses, state

    l1, s1 = run(1)
    l2, s2 = run(2)
    # CE over microbatches averages to the full-batch CE (equal sizes)
    np.testing.assert_allclose(l2, l1, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class _FakeDev:
    """Minimal stand-in for a multi-slice TPU device (CPU devices cannot
    carry slice_index, so the DCN-spanning layout is tested with fakes)."""

    def __init__(self, i, s):
        self.id = i
        self.slice_index = s
        self.process_index = s
        self.platform = "cpu"
        self.device_kind = "fake"

    def __repr__(self):
        return f"D{self.id}s{self.slice_index}"


def test_dcn_factorization_prefers_outer_axes():
    from ucf_vit_tpu.parallel.mesh import _dcn_factorization

    # ddp=4 on 2 slices: DCN takes a factor 2 of ddp, everything else ICI
    assert _dcn_factorization((1, 4, 1, 2, 1, 2), 2) == (
        (1, 2, 1, 1, 1, 1), (1, 2, 1, 2, 1, 2))
    # pp=2 soaks DCN before ddp
    assert _dcn_factorization((2, 4, 1, 2, 1, 2), 2) == (
        (2, 1, 1, 1, 1, 1), (1, 4, 1, 2, 1, 2))
    # 4 slices: pp takes 2, ddp takes 2
    assert _dcn_factorization((2, 4, 1, 2, 1, 2), 4) == (
        (2, 2, 1, 1, 1, 1), (1, 2, 1, 2, 1, 2))
    # slices that don't factor into any axis -> None (make_mesh asserts)
    assert _dcn_factorization((1, 1, 1, 2, 1, 2), 3) is None


def test_multislice_assignment_keeps_inner_axes_on_ici():
    """2 fake slices x 4 devices, ddp=2 ep=1 fsdp=2 tp=2: every (fsdp, tp)
    submesh must live inside ONE slice (per-layer collectives on ICI) and
    the ddp axis must span the slices (its once-per-step all-reduce is the
    DCN-tolerant collective)."""
    from ucf_vit_tpu.parallel.mesh import _assign_devices

    devs = [_FakeDev(i, i // 4) for i in range(8)]
    arr = _assign_devices((1, 2, 1, 2, 1, 2), devs)
    assert arr.shape == (1, 2, 1, 2, 1, 2)
    for ddp_idx in range(2):
        sub = arr[0, ddp_idx].ravel()
        assert len({d.slice_index for d in sub}) == 1, sub
    assert {arr[0, 0, 0, 0, 0, 0].slice_index,
            arr[0, 1, 0, 0, 0, 0].slice_index} == {0, 1}


def test_make_mesh_single_slice_uses_all_axes():
    # the CPU path (no slice_index): create_device_mesh or row-major reshape
    m = make_mesh(simple_ddp_size=2, fsdp_size=2, tensor_par_size=2)
    assert dict(m.shape) == {
        "pp": 1, "ddp": 2, "ep": 1, "fsdp": 2, "sp": 1, "tp": 2
    }
    assert len({d.id for d in m.devices.flat}) == 8


def test_logical_constraint_actually_lowers():
    """Canary for the round-4 root cause: flax's with_logical_constraint
    silently NO-OPs when no global abstract mesh is defined, which made
    every activation constraint in the framework a dead annotation for
    three rounds. parallel.mesh.logical_constraint must emit a real
    sharding op in the lowered module whenever mesh_context is active —
    if a jax/flax upgrade breaks that contract again, this fails loudly."""
    import jax.numpy as jnp

    from ucf_vit_tpu.parallel.mesh import logical_constraint, make_mesh, mesh_context

    mesh = make_mesh(simple_ddp_size=4, tensor_par_size=2)

    def f(x):
        return logical_constraint(x, ("batch", "heads", None)) * 2.0

    x = jnp.zeros((8, 4, 16))
    with mesh_context(mesh):
        txt = jax.jit(f).lower(x).as_text()
    assert ("sharding_constraint" in txt) or ("sdy.sharding" in txt), (
        "logical_constraint lowered to NOTHING — activation sharding "
        "annotations are being silently dropped again"
    )
    # outside any mesh: must be a clean no-op (oracle mode)
    txt_plain = jax.jit(f).lower(x).as_text()
    assert "sharding_constraint" not in txt_plain


def test_spatial_constraint_lowers_and_divisibility_drops():
    """Round-5 'spatial' rule canary: a dividing first-spatial dim must
    emit a real sharding op under an sp mesh, and a NON-dividing dim
    (UNETR's 9^3 level at sp=2, or the 729-token sequence) must be
    dropped to replicated rather than unevenly padded."""
    import jax.numpy as jnp

    from ucf_vit_tpu.parallel.mesh import (
        logical_constraint,
        make_mesh,
        mesh_context,
    )

    mesh = make_mesh(simple_ddp_size=4, seq_par_size=2)

    def f(x):
        return logical_constraint(x, ("batch", "spatial", None, None)) * 2.0

    with mesh_context(mesh):
        # 18 divides sp=2 -> real constraint
        txt = jax.jit(f).lower(jnp.zeros((8, 18, 18, 4))).as_text()
        assert ("sharding_constraint" in txt) or ("sdy.sharding" in txt)
        # 9 does not divide sp=2 -> spatial dim dropped; batch still
        # constrained (the op exists but must not mention the sp axis
        # on dim 1 — easiest robust check: lowering must not fail and
        # an odd-dim-only constraint must be a no-op)
        def g(x):
            return logical_constraint(x, (None, "spatial", None, None)) * 2.0

        txt9 = jax.jit(g).lower(jnp.zeros((8, 9, 9, 4))).as_text()
        assert "sharding_constraint" not in txt9
