"""Pipeline parallelism (GPipe over the 'pp' mesh axis) — capability-plus:
the reference has NO pipeline parallelism (SURVEY §2.5 lists PP as absent;
its surface is DDP x FSDP x TP, `src/UCF_VIT/utils/misc.py:129-238`).

The schedule (`parallel/pipeline.py`) must be a pure re-bracketing of the
sequential block stack: identical forward, identical gradients up to f32
reassociation, composing with the data/tensor axes GSPMD manages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.parallel.mesh import make_mesh, mesh_context, shard_batch
from ucf_vit_tpu.parallel.pipeline import pick_microbatches
from ucf_vit_tpu.parallel.train_step import unbox

KW = dict(
    img_size=(32, 32),
    patch_size=8,
    in_chans=3,
    embed_dim=48,
    depth=8,
    num_heads=4,
    num_classes=5,
    class_token=True,
    twoD=True,
    default_vars=("v",),
    attn_impl=AttnImpl.EINSUM,
)


def _data():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(8, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(r.integers(0, 5, size=(8,)), jnp.int32)
    return x, y


def _loss(model, y):
    def f(p, xx):
        lse = jax.nn.log_softmax(model.apply({"params": p}, xx))
        return -jnp.mean(jnp.take_along_axis(lse, y[:, None], 1))

    return f


def test_pick_microbatches():
    assert pick_microbatches(8, 4, requested=4) == 4
    with pytest.raises(AssertionError):
        pick_microbatches(8, 4, requested=3)
    # auto: largest divisor of batch <= 4 * pp
    assert pick_microbatches(24, 2, 0) == 8
    assert pick_microbatches(7, 4, 0) == 7
    assert pick_microbatches(5, 1, 0) == 1  # 4*1=4, divisors of 5 <= 4 -> 1
    # data-extent alignment: each microbatch must cover every data shard
    assert pick_microbatches(24, 2, 0, data_extent=4) == 6  # 24/6=4 aligned
    assert pick_microbatches(24, 2, 0, data_extent=8) == 3  # 24/3=8 aligned
    # unalignable (batch 7 has no divisor with an 8-divisible cofactor):
    # fall back to the bubble-optimal pick
    assert pick_microbatches(7, 4, 0, data_extent=8) == 7


@pytest.mark.parametrize("pp,ddp,micro", [(4, 2, 4), (2, 2, 8), (8, 1, 2)])
def test_pp_matches_sequential(pp, ddp, micro):
    """pp x ddp pipelined ViT == the plain scan model, fwd and grad."""
    if pp * ddp > len(jax.devices()):
        pytest.skip("needs 8 devices")
    x, y = _data()
    m0 = VIT(**KW, scan_layers=True)
    m1 = VIT(**KW, scan_layers=True, pipe_par_size=pp, pipe_microbatches=micro)
    v = unbox(m0.init(jax.random.key(0), x)["params"])
    y0 = m0.apply({"params": v}, x)
    g0 = jax.grad(_loss(m0, y))(v, x)
    gmax = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(g0))

    mesh = make_mesh(simple_ddp_size=ddp, pipe_par_size=pp)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        y1 = jax.jit(lambda p, xx: m1.apply({"params": p}, xx))(v, xs)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
        g1 = jax.jit(jax.grad(_loss(m1, y)))(v, xs)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-5 * max(gmax, 1.0), (
            float(jnp.max(jnp.abs(a - b))),
            gmax,
        )


def test_pp_composes_with_tp():
    """pp=2 x tp=2 x ddp=2: GSPMD keeps managing the tensor/data axes in
    auto mode inside the manual-over-pp schedule."""
    x, y = _data()
    m0 = VIT(**KW, scan_layers=True)
    m1 = VIT(**KW, scan_layers=True, pipe_par_size=2, pipe_microbatches=4)
    v = unbox(m0.init(jax.random.key(0), x)["params"])
    y0 = m0.apply({"params": v}, x)
    mesh = make_mesh(simple_ddp_size=2, tensor_par_size=2, pipe_par_size=2)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        y1 = jax.jit(lambda p, xx: m1.apply({"params": p}, xx))(v, xs)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)


def test_pp_train_step_mae():
    """Full sharded MAE train step with BOTH the encoder and decoder stacks
    pipelined (pp=2 x ddp=2 x fsdp=2): the pp=2 loss must equal the pp=1
    loss on the SAME weights (the pp model's stacked decoder params are
    transplanted from the pp=1 model's per-layer decoder params)."""
    from ucf_vit_tpu.models import MAE
    from ucf_vit_tpu.ops.patchify import patchify
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )
    from ucf_vit_tpu.utils.metrics import masked_mse
    from ucf_vit_tpu.utils.optim import configure_optimizer

    mae_kw = dict(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=0.75, attn_impl=AttnImpl.EINSUM, scan_layers=True,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 3, 32, 32)), jnp.float32
    )
    m1 = MAE(**mae_kw)
    m2 = MAE(**mae_kw, pipe_par_size=2, pipe_microbatches=2)
    v1 = unbox(
        m1.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)[
            "params"
        ]
    )
    # per-layer decoder_blocks_i -> stacked decoder_blocks/block
    n_dec = mae_kw["decoder_depth"]
    layers = [v1[f"decoder_blocks_{i}"] for i in range(n_dec)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    v2 = {k: v for k, v in v1.items() if not k.startswith("decoder_blocks_")}
    v2["decoder_blocks"] = {"block": stacked}

    def make_loss(model):
        def loss_fn(params, batch, rng):
            pred, mask = model.apply(
                {"params": params}, batch["x"], rngs={"mask": rng}
            )
            return masked_mse(pred, patchify(batch["x"], 8, True), mask)

        return loss_fn

    l1 = float(make_loss(m1)(v1, {"x": x}, jax.random.key(2)))

    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, pipe_par_size=2)
    with mesh_context(mesh):
        def init_fn():
            return m2.init(
                {"params": jax.random.key(0), "mask": jax.random.key(1)}, x
            )

        shapes = jax.eval_shape(init_fn)["params"]
        tx = configure_optimizer(shapes, lr=1e-3, warmup_steps=2, max_steps=10)
        state, _ = create_sharded_train_state(init_fn, tx, mesh)
        # overwrite the fresh init with the transplanted pp=1 weights,
        # keeping the mesh shardings the state was created with
        state = state.replace(
            params=jax.tree.map(
                lambda tgt, src: jax.device_put(src, tgt.sharding),
                state.params,
                v2,
            )
        )
        step = make_train_step(make_loss(m2), tx)
        state, loss, _ = step(
            state, shard_batch(mesh, {"x": x}), jax.random.key(2)
        )
        l2 = float(loss)
    assert np.isfinite(l2)
    assert np.isclose(l1, l2, rtol=0, atol=5e-5), (l1, l2)


def test_pp_config_asserts():
    from tests.test_trainer import _cfg

    cfg = _cfg("classification", extra_data={"num_classes": 3})
    cfg.raw["parallelism"]["pipe_par_size"] = 3  # depth must divide
    cfg.raw["model"]["net"]["init_args"]["depth"] = 4
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.raw["parallelism"]["pipe_par_size"] = 2
    cfg.validate()  # 4 % 2 == 0: fine

    # UNETR skip connections compose with pp since round 4 (take_indices)
    ucfg = _cfg("unetr", extra_data={"num_classes": 3})
    ucfg.raw["parallelism"]["pipe_par_size"] = 2
    ucfg.raw["model"]["net"]["init_args"]["depth"] = 4
    ucfg.raw["model"]["net"]["init_args"]["skip_connection"] = True
    ucfg.validate()

    # MoE x pp requires the scanned stack's moe_every == 1
    mcfg = _cfg("classification", extra_data={"num_classes": 3})
    mcfg.raw["parallelism"]["pipe_par_size"] = 2
    mcfg.raw["model"]["net"]["init_args"].update(
        depth=4, moe_num_experts=4, moe_every=2
    )
    with pytest.raises(AssertionError, match="moe_every"):
        mcfg.validate()
    mcfg.raw["model"]["net"]["init_args"]["moe_every"] = 1
    mcfg.validate()


def test_pp_diffusion_decoder():
    """DiffusionVIT's decoder stack is pipelined too: pp=2 forward equals
    the sequential model on transplanted weights."""
    from ucf_vit_tpu.models import DiffusionVIT

    kw = dict(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, class_token=False, default_vars=("r", "g", "b"),
        time_steps=10, attn_impl=AttnImpl.EINSUM, scan_layers=True,
    )
    m1 = DiffusionVIT(**kw)
    m2 = DiffusionVIT(**kw, pipe_par_size=2, pipe_microbatches=2)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(4, 3, 32, 32)), jnp.float32)
    t = jnp.asarray(r.integers(0, 10, size=(4,)), jnp.int32)
    v1 = unbox(m1.init({"params": jax.random.key(0)}, x, t)["params"])
    layers = [v1[f"decoder_blocks_{i}"] for i in range(2)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    v2 = {k: v for k, v in v1.items() if not k.startswith("decoder_blocks_")}
    v2["decoder_blocks"] = {"block": stacked}

    y1 = m1.apply({"params": v1}, x, t)
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, pipe_par_size=2)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        y2 = jax.jit(lambda p, xx, tt: m2.apply({"params": p}, xx, tt))(
            v2, xs, t
        )
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


def test_relayout_stacked_roundtrip():
    """Elastic topology across pp: a per-layer (non-pp) MAE params tree
    relayouts into the pp model's stacked decoder layout and back,
    numerically identical — the trainer applies this on init_params_from."""
    from ucf_vit_tpu.checkpoint import relayout_stacked
    from ucf_vit_tpu.models import MAE

    mae_kw = dict(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=0.75, attn_impl=AttnImpl.EINSUM,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    # plain model: per-layer blocks_i AND decoder_blocks_i
    v_plain = unbox(MAE(**mae_kw).init(rngs, x)["params"])
    # pp model: stacked blocks (scan) and stacked decoder
    m_pp = MAE(**mae_kw, scan_layers=True, pipe_par_size=2,
               pipe_microbatches=2)
    v_pp_t = jax.eval_shape(lambda: m_pp.init(rngs, x))["params"]
    v_pp_t = unbox(v_pp_t)

    v_to_pp = relayout_stacked(v_plain, v_pp_t)
    assert jax.tree.structure(v_to_pp) == jax.tree.structure(v_pp_t)
    for a, b in zip(jax.tree.leaves(v_to_pp), jax.tree.leaves(v_pp_t)):
        assert np.shape(a) == b.shape, (np.shape(a), b.shape)
    # and back
    v_back = relayout_stacked(v_to_pp, v_plain)
    assert jax.tree.structure(v_back) == jax.tree.structure(v_plain)
    for a, b in zip(jax.tree.leaves(v_back), jax.tree.leaves(v_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_with_grad_accum():
    """pipe microbatching composes with make_train_step's gradient
    accumulation (each accum microbatch is itself pipelined)."""
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )
    from ucf_vit_tpu.utils.optim import configure_optimizer

    x, y = _data()
    m = VIT(**KW, scan_layers=True, pipe_par_size=2, pipe_microbatches=2)
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, pipe_par_size=2)

    def loss_fn(params, batch, rng):
        lse = jax.nn.log_softmax(m.apply({"params": params}, batch["x"]))
        return -jnp.mean(jnp.take_along_axis(lse, batch["y"][:, None], 1))

    with mesh_context(mesh):
        def init_fn():
            return m.init(jax.random.key(0), x)

        shapes = jax.eval_shape(init_fn)["params"]
        tx = configure_optimizer(shapes, lr=1e-3, warmup_steps=2, max_steps=10)
        state, _ = create_sharded_train_state(init_fn, tx, mesh)
        step = make_train_step(loss_fn, tx, accum_steps=2)
        state, loss, _ = step(
            state, shard_batch(mesh, {"x": x, "y": y}), jax.random.key(1)
        )
        assert np.isfinite(float(loss))


def test_relayout_stacked_depth_mismatch_raises():
    """Unstacking a DEEPER stacked checkpoint into a shallower per-layer
    model must fail loudly, not silently discard the tail layers (round-3
    review finding — the stack direction already tripped a shape assert)."""
    from ucf_vit_tpu.checkpoint import relayout_stacked

    stacked = {
        "blocks": {"block": {"w": np.zeros((4, 3, 3), np.float32)}},
        "head": {"w": np.zeros((3,), np.float32)},
    }
    target = {
        "blocks_0": {"w": np.zeros((3, 3), np.float32)},
        "blocks_1": {"w": np.zeros((3, 3), np.float32)},
        "head": {"w": np.zeros((3,), np.float32)},
    }
    with pytest.raises(AssertionError, match="depth 4"):
        relayout_stacked(stacked, target)
    # equal depths still relayout fine
    ok = {"blocks": {"block": {"w": np.zeros((2, 3, 3), np.float32)}},
          "head": {"w": np.zeros((3,), np.float32)}}
    out = relayout_stacked(ok, target)
    assert set(out) == {"blocks_0", "blocks_1", "head"}


def test_pp_unetr_skip_connections():
    """UNETR under pipeline parallelism (VERDICT r3 #4): the GPipe schedule
    now emits the 3 skip-connection taps (take_indices) from their owning
    stages, so forward_intermediates works with pp > 1 — fwd and grad must
    match the pp=1 scan model exactly."""
    from ucf_vit_tpu.models import UNETR

    kw = dict(
        img_size=(32, 32), patch_size=8, in_chans=1, embed_dim=48, depth=8,
        num_heads=4, num_classes=3, class_token=False, twoD=True,
        default_vars=("ct",), attn_impl=AttnImpl.EINSUM, feature_size=4,
        skip_connection=True, scan_layers=True,
    )
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(8, 1, 32, 32)), jnp.float32)
    tgt = jnp.asarray(r.integers(0, 3, size=(8, 32, 32)), jnp.int32)

    m0 = UNETR(**kw)
    m1 = UNETR(**kw, pipe_par_size=2, pipe_microbatches=4)
    v = unbox(m0.init(jax.random.key(0), x)["params"])
    y0 = m0.apply({"params": v}, x)

    def make_loss(model):
        def f(p, xx):
            logits = model.apply({"params": p}, xx)  # [B, C, H, W]
            lse = jax.nn.log_softmax(logits, axis=1)
            return -jnp.mean(jnp.take_along_axis(lse, tgt[:, None], 1))

        return f

    g0 = jax.grad(make_loss(m0))(v, x)
    gmax = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(g0))

    mesh = make_mesh(simple_ddp_size=4, pipe_par_size=2)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        y1 = jax.jit(lambda p, xx: m1.apply({"params": p}, xx))(v, xs)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), atol=3e-5, rtol=1e-5
        )
        g1 = jax.jit(jax.grad(make_loss(m1)))(v, xs)
    for (k, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree.leaves(g1)
    ):
        assert float(jnp.max(jnp.abs(a - b))) <= 2e-5 * max(gmax, 1.0), (
            k, float(jnp.max(jnp.abs(a - b))), gmax,
        )


def test_pp_moe_matches_scan():
    """MoE blocks inside the GPipe schedule (round 4; previously asserted
    off): expert einsums stay GSPMD-auto over ep inside the manual-over-pp
    region (bare-PartitionSpec constraints), and the sow'd load-balance aux
    rides the schedule as an accumulated scalar. With pipe_microbatches=1
    the pp=2 loss (task + aux) and grads must equal the scan model exactly;
    m>1 changes only the aux averaging (grad-accum semantics)."""
    from ucf_vit_tpu.models.moe import collect_moe_aux

    kw = dict(
        KW,
        depth=4,
        scan_layers=True,
        moe_num_experts=4,
        moe_top_k=2,
        moe_every=1,
    )
    x, y = _data()
    m0 = VIT(**kw)
    m1 = VIT(**kw, pipe_par_size=2, pipe_microbatches=1)
    v = unbox(m0.init(jax.random.key(0), x)["params"])

    def make_loss(model):
        def f(p, xx):
            logits, mut = model.apply({"params": p}, xx, mutable="moe")
            lse = jax.nn.log_softmax(logits)
            ce = -jnp.mean(jnp.take_along_axis(lse, y[:, None], 1))
            return ce + 0.01 * collect_moe_aux(mut)

        return f

    l0 = float(make_loss(m0)(v, x))
    g0 = jax.grad(make_loss(m0))(v, x)
    gmax = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(g0))

    mesh = make_mesh(simple_ddp_size=2, expert_par_size=2, pipe_par_size=2)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        l1 = float(jax.jit(make_loss(m1))(v, xs))
        assert abs(l0 - l1) < 2e-5, (l0, l1)
        g1 = jax.jit(jax.grad(make_loss(m1)))(v, xs)
    for (k, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree.leaves(g1)
    ):
        assert float(jnp.max(jnp.abs(a - b))) <= 2e-5 * max(gmax, 1.0), (
            k, float(jnp.max(jnp.abs(a - b))), gmax,
        )


def test_pp_bf16_compiles_and_matches():
    """bf16 x pp compile guard (round-4 find): jax's shardy lowering roots
    psum/psum_invariant reducers with a Sharding custom-call; the partitioner
    rewrites it to a `copy` and XLA's bf16 float-normalization then crashes
    ("Invalid binary instruction opcode copy") — which made the shipped
    vit_l_pp config (data_type bfloat16) uncompilable. The schedule now keeps
    every reducer-crossing value f32 (pipeline.py boundary notes). This test
    both compiles/executes a bf16 pp model AND checks it against the bf16
    scan model."""
    x, y = _data()
    kw = dict(KW, dtype=jnp.bfloat16)
    m0 = VIT(**kw, scan_layers=True)
    m1 = VIT(**kw, scan_layers=True, pipe_par_size=2, pipe_microbatches=4)
    v = unbox(m0.init(jax.random.key(0), x)["params"])
    y0 = m0.apply({"params": v}, x)

    mesh = make_mesh(simple_ddp_size=4, pipe_par_size=2)
    with mesh_context(mesh):
        xs = shard_batch(mesh, x)
        y1 = jax.jit(lambda p, xx: m1.apply({"params": p}, xx))(v, xs)
        np.testing.assert_allclose(
            np.asarray(y0, np.float32), np.asarray(y1, np.float32),
            atol=3e-2, rtol=3e-2,  # bf16 reassociation noise
        )
        g1 = jax.jit(jax.grad(_loss(m1, y)))(v, xs)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in jax.tree.leaves(g1))


def test_pp_memory_falls_with_microbatch_count():
    """Round-5 measurement guard: in this lockstep-scan GPipe formulation,
    per-tick remat carries are [b/M, ...] and the scan saves (M+S-1) of
    them — total ~ const * (1 + (S-1)/M) — so BOTH the bubble and the
    activation memory improve monotonically with M (the classic
    "bubble-vs-memory" 1F1B tension does not exist here; measured on
    vit_l_pp: 5.2 GB -> 1.48 GB temp going M=4 -> 16, BASELINE.md round 5).
    Guard the property on a tiny model: AOT temp bytes at M=8 must not
    exceed temp bytes at M=2."""
    x, y = _data()
    mesh = make_mesh(simple_ddp_size=4, pipe_par_size=2)

    def temp_bytes(micro):
        model = VIT(**KW, scan_layers=True, pipe_par_size=2,
                    pipe_microbatches=micro, remat=True)
        v = unbox(model.init(jax.random.key(0), x)["params"])
        with mesh_context(mesh):
            xs = shard_batch(mesh, x)
            lowered = jax.jit(jax.grad(_loss(model, y))).lower(v, xs)
            return int(lowered.compile().memory_analysis().temp_size_in_bytes)

    t2, t8 = temp_bytes(2), temp_bytes(8)
    assert t8 <= t2, f"temp grew with M: M=2 {t2:,} -> M=8 {t8:,}"
