"""Flagship-path (MAE) sharded-vs-single-device equivalence on the CPU mesh —
the reference's dual-mode cross-check principle (`README.md:963`) applied to
its flagship train_masked_fsdp workload (SURVEY.md §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.models import MAE
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
from ucf_vit_tpu.utils.metrics import masked_mse
from ucf_vit_tpu.utils.optim import configure_optimizer


def test_mae_hybrid_mesh_matches_single_device():
    model = MAE(
        img_size=(16, 16), patch_size=8, in_chans=3, embed_dim=16, depth=2,
        num_heads=2, class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=0.75, decoder_embed_dim=8, decoder_depth=1,
        decoder_num_heads=2, attn_impl=AttnImpl.EINSUM,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 3, 16, 16)), jnp.float32)
    batch = {"x": x}

    def init_fn():
        return model.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)}, x
        )

    def loss_fn(params, b, rng):
        pred, mask = model.apply({"params": params}, b["x"], rngs={"mask": rng})
        return masked_mse(pred, patchify(b["x"], 8, True), mask)

    params_shapes = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(params_shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    # single device
    params0 = unbox(init_fn()["params"])
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params0, opt_state=tx.init(params0)
    )
    step = make_train_step(loss_fn, tx, donate=False)
    ref = []
    for i in range(3):
        state0, loss, _ = step(state0, batch, jax.random.key(i))
        ref.append(float(loss))

    # hybrid ddp x fsdp x tp mesh
    mesh = make_mesh(2, 2, 1, 2)
    with mesh_context(mesh):
        state, _ = create_sharded_train_state(init_fn, tx, mesh)
        sbatch = shard_batch(mesh, batch)
        sstep = make_train_step(loss_fn, tx, donate=False)
        got = []
        for i in range(3):
            state, loss, _ = sstep(state, sbatch, jax.random.key(i))
            got.append(float(loss))

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
