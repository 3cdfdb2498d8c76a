"""Model-level sequence-parallel (sp>1) equivalence on the CPU mesh.

SP is this framework's flagship capability-plus over the reference's
declared-but-empty `seq_par_size` (asserted ==1 in every script,
`train_masked_fsdp.py:220`). These tests prove the `"seq" -> sp` logical
rule through the full models — including MAE's argsort-based masking and
decoder un-shuffle (`models/mae.py:123-161`) — not just the attention op:
sharded loss must match single-device loss for VIT and MAE, einsum and
flash(interpret) attention, scan_layers on and off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models import MAE, VIT
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.ops.patchify import patchify
from ucf_vit_tpu.parallel import make_mesh
from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    TrainState,
    create_sharded_train_state,
    make_train_step,
    unbox,
)
from ucf_vit_tpu.utils.metrics import cross_entropy, masked_mse
from ucf_vit_tpu.utils.optim import configure_optimizer


def _run_pair(model, batch, loss_fn, mesh_shape, steps=2, rtol=2e-4):
    """Single-device vs sharded train losses for the same model/batch."""

    def init_fn():
        return model.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)},
            batch["x"],
        )

    params_shapes = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(params_shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    params0 = unbox(init_fn()["params"])
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params0, opt_state=tx.init(params0)
    )
    step = make_train_step(loss_fn, tx, donate=False)
    ref = []
    for i in range(steps):
        state0, loss, _ = step(state0, batch, jax.random.key(i))
        ref.append(float(loss))

    mesh = make_mesh(*mesh_shape)
    with mesh_context(mesh):
        state, _ = create_sharded_train_state(init_fn, tx, mesh)
        sbatch = shard_batch(mesh, batch)
        sstep = make_train_step(loss_fn, tx, donate=False)
        got = []
        for i in range(steps):
            state, loss, _ = sstep(state, sbatch, jax.random.key(i))
            got.append(float(loss))

    np.testing.assert_allclose(got, ref, rtol=rtol, atol=2e-5)


def _mae(impl, scan_layers=False):
    # 32^2 / p8 -> 16 tokens; mask 0.75 keeps 4 (divisible by sp=2 for the
    # shard_map flash path)
    return MAE(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=16, depth=2,
        num_heads=2, class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=0.75, decoder_embed_dim=8, decoder_depth=1,
        decoder_num_heads=2, attn_impl=impl, scan_layers=scan_layers,
    )


def _mae_batch():
    rng = np.random.default_rng(0)
    return {"x": jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)}


def _mae_loss(model):
    def loss_fn(params, b, rng):
        pred, mask = model.apply({"params": params}, b["x"], rngs={"mask": rng})
        return masked_mse(pred, patchify(b["x"], 8, True), mask)

    return loss_fn


@pytest.mark.parametrize("mesh_shape", [(1, 2, 2, 2), (2, 1, 2, 2)])
@pytest.mark.parametrize("impl", [AttnImpl.EINSUM, AttnImpl.FLASH])
def test_mae_sp2_matches_single_device(mesh_shape, impl):
    model = _mae(impl)
    _run_pair(model, _mae_batch(), _mae_loss(model), mesh_shape)


def test_mae_sp2_scan_layers():
    model = _mae(AttnImpl.EINSUM, scan_layers=True)
    _run_pair(model, _mae_batch(), _mae_loss(model), (1, 2, 2, 2))


@pytest.mark.parametrize("mesh_shape", [(1, 2, 2, 2), (2, 1, 2, 2)])
def test_vit_sp2_matches_single_device(mesh_shape):
    model = VIT(
        img_size=(32, 32), patch_size=8, in_chans=3, num_classes=4,
        embed_dim=16, depth=2, num_heads=2, default_vars=("v",),
        attn_impl=AttnImpl.EINSUM,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 4, size=(8,))),
    }

    def loss_fn(params, b, rng):
        logits = model.apply({"params": params}, b["x"])
        return cross_entropy(logits, b["y"])

    _run_pair(model, batch, loss_fn, mesh_shape)


def test_mae_seq_pack_on_sp_mesh_matches_single_device():
    """Composition: sequence packing (block-diagonal segment mask) under an
    sp=2 x tp=2 x fsdp=2 mesh must still match the single-device loss —
    the segment mask is a plain einsum mask, so GSPMD shards it with the
    packed sequence."""
    model = MAE(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=16, depth=2,
        num_heads=2, class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=0.75, decoder_embed_dim=8, decoder_depth=1,
        decoder_num_heads=2, attn_impl=AttnImpl.EINSUM, seq_pack=4,
    )
    _run_pair(model, _mae_batch(), _mae_loss(model), (1, 2, 2, 2))
