"""Checkpoint even/odd round trip + MAE encoder transfer."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu import checkpoint as ckpt
from ucf_vit_tpu.models import MAE, UNETR
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.parallel.train_step import TrainState, unbox


def _state(seed=0):
    params = {
        "w": jnp.full((4, 4), float(seed)),
        "pos_embed": jnp.arange(8.0).reshape(1, 4, 2),
    }
    return TrainState(
        step=jnp.asarray(seed, jnp.int32), params=params, opt_state={"mu": params}
    )


def test_even_odd_roundtrip(tmp_path):
    path = str(tmp_path)
    p_even = ckpt.save_checkpoint(path, "last", epoch=4, state=_state(4),
                                  loss_list=[1.0, 0.5])
    p_odd = ckpt.save_checkpoint(path, "last", epoch=5, state=_state(5),
                                 loss_list=[1.0, 0.5, 0.3])
    assert p_even.endswith("last_even") and p_odd.endswith("last_odd")

    # epoch 6 overwrites the even slot; odd survives (crash robustness)
    ckpt.save_checkpoint(path, "last", epoch=6, state=_state(6), loss_list=[0.2])
    got = ckpt.restore_checkpoint(path, "last_odd")
    assert int(got["epoch"]) == 5
    np.testing.assert_array_equal(np.asarray(got["state"]["params"]["w"]),
                                  np.full((4, 4), 5.0))
    got6 = ckpt.restore_checkpoint(path, "last_even")
    assert int(got6["epoch"]) == 6
    assert ckpt.loss_list_from_payload(got6) == [0.2]
    # v2 payloads carry the explicit format version in the key name; a
    # first-epoch loss equal to len-1 (the v1 heuristic's ambiguity) decodes
    # correctly
    amb = ckpt.save_checkpoint(path, "amb", epoch=0, state=_state(0),
                               loss_list=[0.0])
    assert ckpt.loss_list_from_payload(ckpt.restore_checkpoint(path, "amb_even")) == [0.0]
    # legacy v1 payloads still decode
    assert ckpt.loss_list_from_payload({"loss_list": np.asarray([2.0, 1.0, 0.5])}) == [1.0, 0.5]


def test_transfer_mae_encoder():
    common = dict(
        img_size=(16, 16), patch_size=8, in_chans=1, embed_dim=16, depth=4,
        num_heads=2, class_token=False, default_vars=("v",),
        attn_impl=AttnImpl.EINSUM,
    )
    mae = MAE(mask_ratio=0.5, decoder_depth=1, decoder_embed_dim=8,
              decoder_num_heads=2, **common)
    x = jnp.ones((1, 1, 16, 16))
    mae_params = unbox(
        mae.init({"params": jax.random.key(7), "mask": jax.random.key(1)}, x)["params"]
    )

    unetr = UNETR(num_classes=2, feature_size=2, skip_connection=False, **common)
    un_params = unbox(unetr.init(jax.random.key(0), x)["params"])

    out = ckpt.transfer_mae_encoder(mae_params, un_params)
    # encoder weights copied
    np.testing.assert_array_equal(
        np.asarray(out["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(mae_params["blocks_0"]["attn"]["qkv"]["kernel"]),
    )
    # decoder-only keys NOT copied into the unetr tree
    assert "decoder_pred" not in out
    # unetr-specific weights untouched
    np.testing.assert_array_equal(
        np.asarray(out["out"]["conv"]["kernel"]),
        np.asarray(un_params["out"]["conv"]["kernel"]),
    )
    # pos-embed copied (same length here)
    np.testing.assert_array_equal(
        np.asarray(out["pos_embed"]), np.asarray(mae_params["pos_embed"])
    )


def test_latest_slot_resolution(tmp_path):
    """'<name>_latest' picks the slot with the larger *stored epoch* (mtime
    only breaks ties), and the preemption-style slot override writes the
    resume epoch into a chosen parity slot without touching the other."""
    import os
    import time

    path = str(tmp_path)
    ckpt.save_checkpoint(path, "last", epoch=4, state=_state(4), loss_list=[1.0])
    time.sleep(0.05)
    ckpt.save_checkpoint(path, "last", epoch=5, state=_state(5), loss_list=[1.0, 0.5])
    # deliberately skew mtimes so the OLDER-epoch slot looks newer on disk
    # (clock skew / rsync on shared storage): the stored epoch must win
    now = time.time()
    os.utime(os.path.join(path, "last_even"), (now + 3600, now + 3600))
    got = ckpt.restore_checkpoint(path, "last_latest")
    assert int(got["epoch"]) == 5  # odd slot holds the larger epoch

    # preemption during epoch 6: record epoch 5 for resume but write the
    # even (oldest) slot — the committed odd checkpoint must survive
    time.sleep(0.05)
    ckpt.save_checkpoint(path, "last", epoch=5, state=_state(7),
                         loss_list=[1.0, 0.5], slot_epoch=6)
    got = ckpt.restore_checkpoint(path, "last_latest")
    assert int(got["epoch"]) == 5
    np.testing.assert_array_equal(np.asarray(got["state"]["params"]["w"]),
                                  np.full((4, 4), 7.0))  # the even slot (newer)
    odd = ckpt.restore_checkpoint(path, "last_odd")
    np.testing.assert_array_equal(np.asarray(odd["state"]["params"]["w"]),
                                  np.full((4, 4), 5.0))  # untouched


def test_elastic_topology_resume(tmp_path):
    """Save under fsdp=2, restore under fsdp=4 and under tp=2: Orbax restores
    onto whatever sharding the abstract payload carries, so checkpoints are
    topology-elastic (the reference must hand-map per-rank shard files,
    `train_masked_fsdp.py:405-411`). Losses of the restored runs must match
    the uninterrupted run exactly."""
    import jax.numpy as jnp

    from ucf_vit_tpu.models import MAE
    from ucf_vit_tpu.ops.attention import AttnImpl
    from ucf_vit_tpu.ops.patchify import patchify
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )
    from ucf_vit_tpu.utils.metrics import masked_mse
    from ucf_vit_tpu.utils.optim import configure_optimizer

    model = MAE(img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=16,
                depth=2, num_heads=2, class_token=False,
                default_vars=("r", "g", "b"), mask_ratio=0.75,
                decoder_embed_dim=8, decoder_depth=1, decoder_num_heads=2,
                attn_impl=AttnImpl.EINSUM)
    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)}

    def init_fn():
        return model.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)},
            batch["x"],
        )

    def loss_fn(params, b, r):
        pred, mask = model.apply({"params": params}, b["x"], rngs={"mask": r})
        return masked_mse(pred, patchify(b["x"], 8, True), mask)

    shapes = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(shapes, lr=1e-3, warmup_steps=2, max_steps=10)

    def run(mesh_shape, state=None, steps=2, key0=0):
        mesh = make_mesh(*mesh_shape)
        with mesh_context(mesh):
            if state is None:
                state, sharding = create_sharded_train_state(init_fn, tx, mesh)
            else:
                tmpl, sharding = create_sharded_train_state(init_fn, tx, mesh)
                abstract = jax.tree.map(
                    lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
                    jax.eval_shape(lambda: tmpl),
                    sharding,
                )
                payload = ckpt.restore_checkpoint(
                    str(tmp_path), "el_latest",
                    {"epoch": np.asarray(0), "state": abstract,
                     "loss_list_v2": np.zeros((0,))},
                )
                state = payload["state"]
            step = make_train_step(loss_fn, tx, donate=False)
            losses = []
            for i in range(steps):
                state, loss, _ = step(
                    state, shard_batch(mesh, batch), jax.random.key(key0 + i)
                )
                losses.append(float(loss))
        return state, losses

    # train 2 steps on fsdp=2 x ddp=2, checkpoint
    state, pre = run((2, 2, 1, 1))
    ckpt.save_checkpoint(str(tmp_path), "el", epoch=0, state=state,
                         loss_list=pre)

    # uninterrupted continuation on the SAME mesh = the oracle
    _, oracle = run((2, 2, 1, 1), state=state, key0=2)

    # restore onto fsdp=4
    _, got_fsdp4 = run((1, 4, 1, 1), state="restore", key0=2)
    np.testing.assert_allclose(got_fsdp4, oracle, rtol=1e-6)

    # restore onto tp=2 (param sharding moves to the tensor axis)
    _, got_tp2 = run((2, 1, 1, 2), state="restore", key0=2)
    np.testing.assert_allclose(got_tp2, oracle, rtol=1e-6)


def test_head_meta_guard(tmp_path):
    """Resuming under a different attention-head grouping must fail loudly:
    every head count at a fixed embed_dim has identical parameter shapes, so
    without the guard the restore succeeds and silently computes a different
    function (round-3 review finding on the decoder relayout)."""
    import pytest

    path = str(tmp_path)
    ckpt.save_checkpoint(path, "hm", epoch=2, state=_state(2),
                         loss_list=[1.0], head_meta=(12, 16))

    # matching head grouping restores fine (with and without abstract payload)
    got = ckpt.restore_checkpoint(path, "hm_even", expect_head_meta=(12, 16))
    assert [int(v) for v in got["head_meta"]] == [12, 16]
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape, np.asarray(x).dtype),
        {"epoch": np.asarray(0), "state": _state(0),
         "loss_list_v2": np.zeros((2,))},
    )
    got = ckpt.restore_checkpoint(path, "hm_even", abstract,
                                  expect_head_meta=(12, 16))
    assert int(got["epoch"]) == 2

    # regrouped heads -> hard error naming both layouts
    with pytest.raises(ValueError, match=r"\[12, 16\].*\[12, 4\]"):
        ckpt.restore_checkpoint(path, "hm_even", expect_head_meta=(12, 4))

    # pre-guard checkpoints (no head_meta key) restore without complaint
    ckpt.save_checkpoint(path, "old", epoch=1, state=_state(1), loss_list=[1.0])
    got = ckpt.restore_checkpoint(path, "old_odd", expect_head_meta=(12, 4))
    assert "head_meta" not in got

    # None entries are wildcards: the MAE->UNETR transfer checks only the
    # encoder heads (the decoder is stripped before use)
    got = ckpt.restore_checkpoint(path, "hm_even", expect_head_meta=(12, None))
    assert [int(v) for v in got["head_meta"]] == [12, 16]
    with pytest.raises(ValueError, match="head"):
        ckpt.restore_checkpoint(path, "hm_even", expect_head_meta=(8, None))


def test_head_meta_from_config():
    """The stamp must record the EFFECTIVE head counts (tasks.py build
    defaults), so an omitted key and its explicit default compare equal —
    and decoder-less tasks stamp 0 regardless of stray keys."""

    class _Cfg:
        def __init__(self, task, ia):
            self.task, self.init_args = task, ia

    # omitted decoder_num_heads == explicit default 16 for decoder tasks
    assert ckpt.head_meta_from_config(_Cfg("mae", {"num_heads": 12})) == (12, 16)
    assert ckpt.head_meta_from_config(
        _Cfg("mae", {"num_heads": 12, "decoder_num_heads": 16})
    ) == (12, 16)
    assert ckpt.head_meta_from_config(
        _Cfg("diffusion", {"num_heads": 8, "decoder_num_heads": 4})
    ) == (8, 4)
    # decoder-less tasks: sentinel 0, even if the key is present in the yaml
    assert ckpt.head_meta_from_config(
        _Cfg("classification", {"num_heads": 12, "decoder_num_heads": 16})
    ) == (12, 0)
    assert ckpt.head_meta_from_config(_Cfg("unetr", {})) == (12, 0)


def test_resolve_slot_empty_filename_picks_newest(tmp_path):
    """resolve_slot(dir, '') = newest checkpoint in the directory (by stored
    epoch), or the directory itself if it IS a checkpoint — the default the
    reference-spelling MAE-transfer alias relies on when the user names a
    directory but no slot."""
    path = str(tmp_path)
    ckpt.save_checkpoint(path, "tiny", epoch=2, state=_state(2), loss_list=[])
    ckpt.save_checkpoint(path, "tiny", epoch=7, state=_state(7), loss_list=[])
    got = ckpt.restore_checkpoint(path, "")
    assert int(got["epoch"]) == 7
    # a direct checkpoint dir resolves to itself
    slot = ckpt.resolve_slot(path, "tiny_even")
    assert ckpt.resolve_slot(slot, "") == slot
    # an empty dir fails loudly
    import os as _os, pytest as _pytest
    empty = _os.path.join(path, "nothing")
    _os.makedirs(empty)
    with _pytest.raises(AssertionError, match="no checkpoint slots"):
        ckpt.resolve_slot(empty, "")
