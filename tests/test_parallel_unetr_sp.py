"""UNETR decoder spatial partitioning (sp > 1) equivalence on the CPU mesh.

Round 5 (VERDICT r4 item 3): the conv decoder's full-resolution activations
are the UNETR bandwidth/memory ceiling (BASELINE.md r4: 332 GB cost-model
bytes/step, 9.5% self-MFU), and both rejected studies attacked single-chip
layout. This is the multi-chip lever: `parallelism.seq_par_size > 1` shards
the FIRST spatial dim of every decoder feature map over sp
(`models/unetr.py:_spatial` -> the "spatial" logical rule, mesh.py), with
GSPMD inserting the halo exchanges each conv needs. Per-chip decoder
activation traffic divides by sp.

These tests prove sharded == single-device through the full model (2 train
steps, so gradients are covered transitively), 2D and 3D, skip and no-skip
decoders, and composed with fsdp/tp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models import UNETR
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.parallel import make_mesh
from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    TrainState,
    create_sharded_train_state,
    make_train_step,
    unbox,
)
from ucf_vit_tpu.utils.optim import configure_optimizer


def _unetr(twoD: bool, skip: bool = True, **kw):
    # 3D: 16^3 / p4 -> 4^3 grid; decoder pyramid 4->8->16->32 (-resize->16):
    # every level's first spatial dim divides sp=2
    return UNETR(
        img_size=(16,) * (2 if twoD else 3),
        patch_size=4,
        in_chans=1,
        embed_dim=24,  # 3D sincos needs embed_dim % 3 == 0
        depth=4,
        num_heads=2,
        num_classes=3,
        class_token=False,
        twoD=twoD,
        default_vars=("ct",),
        attn_impl=AttnImpl.EINSUM,
        feature_size=4,
        skip_connection=skip,
        **kw,
    )


def _batch(twoD: bool, bs: int = 8):
    rng = np.random.default_rng(0)
    spatial = (16,) * (2 if twoD else 3)
    return {
        "x": jnp.asarray(rng.normal(size=(bs, 1) + spatial), jnp.float32),
        "t": jnp.asarray(rng.integers(0, 3, size=(bs,) + spatial), jnp.int32),
    }


def _loss(model):
    def loss_fn(params, b, rng):
        del rng
        logits = model.apply({"params": params}, b["x"])
        lse = jax.nn.log_softmax(logits, axis=1)
        return -jnp.mean(jnp.take_along_axis(lse, b["t"][:, None], 1))

    return loss_fn


def _run_pair(model, batch, loss_fn, mesh_shape, steps=2, rtol=2e-4,
              init_args=None):
    def init_fn():
        args = init_args(model, batch) if init_args else (batch["x"],)
        return model.init({"params": jax.random.key(0)}, *args)

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


# (ddp, fsdp, sp, tp) mesh shapes: pure ddp x sp, and sp composed with
# fsdp + tp (the full hybrid the shipped configs can reach)
@pytest.mark.parametrize("mesh_shape", [(4, 1, 2, 1), (1, 2, 2, 2)])
def test_unetr3d_sp2_matches_single_device(mesh_shape):
    model = _unetr(twoD=False)
    _run_pair(model, _batch(twoD=False), _loss(model), mesh_shape)


def test_unetr2d_sp2_matches_single_device():
    model = _unetr(twoD=True)
    _run_pair(model, _batch(twoD=True), _loss(model), (4, 1, 2, 1))


def test_unetr3d_noskip_sp2_matches_single_device():
    model = _unetr(twoD=False, skip=False)
    _run_pair(model, _batch(twoD=False), _loss(model), (4, 1, 2, 1))


def test_unetr3d_sp4_odd_levels_stay_replicated():
    """sp=4 against the 4->8->16->32 pyramid: the 4^3 level divides, but a
    hypothetical non-dividing level must not crash — exercised here via the
    adaptive sqrt-len path whose 3^3 grid (L=27) divides NOTHING at sp=4;
    logical_constraint drops those dims and the model still matches."""
    model = UNETR(
        img_size=(16,) * 3,
        patch_size=2,
        in_chans=1,
        embed_dim=24,
        depth=4,
        num_heads=2,
        num_classes=3,
        class_token=False,
        twoD=False,
        default_vars=("ct",),
        attn_impl=AttnImpl.EINSUM,
        feature_size=4,
        skip_connection=True,
        adaptive_patching=True,
        fixed_length=27,
        sqrt_len_method=True,
    )
    bs = 4
    rng = np.random.default_rng(1)
    # adaptive path consumes the reassembled sqrt-len image x_seq
    # [B, C, (3*2)^3] + per-token positions alongside the raw volume x
    # (train_unetr_simple parity note in models/unetr.py)
    spatial = model.spatial_size
    batch = {
        "x": jnp.asarray(rng.normal(size=(bs, 1) + spatial), jnp.float32),
        "x_seq": jnp.asarray(rng.normal(size=(bs, 1, 6, 6, 6)), jnp.float32),
        "seq_ps": jnp.asarray(rng.normal(size=(bs, 27, 4)), jnp.float32),
        "t": jnp.asarray(rng.integers(0, 3, size=(bs,) + spatial), jnp.int32),
    }

    def loss_fn(params, b, rng_):
        del rng_
        logits = model.apply(
            {"params": params}, b["x"], None, b["seq_ps"], b["x_seq"]
        )
        lse = jax.nn.log_softmax(logits, axis=1)
        return -jnp.mean(jnp.take_along_axis(lse, b["t"][:, None], 1))

    def init_fn_args(m, b):
        return (b["x"], None, b["seq_ps"], b["x_seq"])

    _run_pair(model, batch, loss_fn, (2, 1, 4, 1), init_args=init_fn_args)
