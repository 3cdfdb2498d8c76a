"""Golden-shape tests for VIT, from the reference README usage examples
(`README.md:464-493` and friends) — executable shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.ops.attention import AttnImpl


def _tiny_vit(**kw):
    cfg = dict(
        img_size=(32, 32),
        patch_size=8,
        num_classes=10,
        in_chans=3,
        embed_dim=48,
        depth=2,
        num_heads=4,
        mlp_ratio=4,
        twoD=True,
        use_varemb=False,
        default_vars=("red", "green", "blue"),
        single_channel=False,
        adaptive_patching=False,
        attn_impl=AttnImpl.EINSUM,
    )
    cfg.update(kw)
    return VIT(**cfg)


def test_vit_classification_shape():
    model = _tiny_vit()
    x = jnp.zeros((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)


def test_vit_3d_shape():
    model = _tiny_vit(img_size=(16, 16, 16), patch_size=4, twoD=False)
    x = jnp.zeros((2, 3, 16, 16, 16))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)


def test_vit_varemb_aggregation():
    model = _tiny_vit(use_varemb=True, in_chans=3)
    x = jnp.ones((2, 3, 32, 32))
    var_ids = model.get_var_ids(["red", "green", "blue"])
    params = model.init(jax.random.key(0), x, var_ids)
    out = model.apply(params, x, var_ids)
    assert out.shape == (2, 10)

    # Subset of variables must also work (the point of varemb).
    x2 = jnp.ones((2, 2, 32, 32))
    out2 = model.apply(params, x2, model.get_var_ids(["red", "blue"]))
    assert out2.shape == (2, 10)


def test_vit_single_channel():
    model = _tiny_vit(use_varemb=True, single_channel=True, in_chans=1)
    x = jnp.ones((2, 1, 32, 32))
    var_ids = model.get_var_ids(["green"])
    params = model.init(jax.random.key(0), x, var_ids)
    out = model.apply(params, x, var_ids)
    assert out.shape == (2, 10)


def test_vit_adaptive_patching():
    # fixed_length must be ≡ 1 mod 3 for the quadtree; 16 tokens of 8x8 patches
    fixed_length = 13
    model = _tiny_vit(
        adaptive_patching=True,
        fixed_length=fixed_length,
        use_adaptive_pos_emb=True,
        class_token=True,
    )
    x = jnp.ones((2, 3, fixed_length, 64))  # [B, C, S, p^2]
    seq_ps = jnp.ones((2, fixed_length, 3))  # [B, S, (size, cx, cy)]
    params = model.init(jax.random.key(0), x, None, seq_ps)
    out = model.apply(params, x, None, seq_ps)
    assert out.shape == (2, 10)


def test_vit_pos_embed_is_sincos_at_init():
    from ucf_vit_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    model = _tiny_vit(class_token=True)
    x = jnp.zeros((1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    pe = params["params"]["pos_embed"]
    pe = np.asarray(pe.unbox() if hasattr(pe, "unbox") else pe)
    expected = get_2d_sincos_pos_embed(48, 4, 4, cls_token=True)
    np.testing.assert_allclose(pe[0], expected, atol=1e-6)


def test_vit_grad_flows():
    model = _tiny_vit()
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)

    def loss_fn(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # qkv kernels must receive gradient
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gsum > 0


def test_remat_with_dropout_and_droppath():
    """remat + nonzero drop rates: nn.remat's static_argnums must mark
    `deterministic` (flax core arg index 2, after module and x) — marking
    index 1 left it traced, and any drop rate > 0 then raised
    TracerBoolConversionError inside DropPath/Dropout (round-3 drive
    finding; latent because every shipped remat config uses zero drops)."""
    model = _tiny_vit(remat=True, proj_drop_rate=0.3, drop_path_rate=0.2)
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x
    )

    def loss_fn(p, rng):
        out = model.apply(
            p, x, deterministic=False, rngs={"dropout": rng}
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss_fn)(params, jax.random.key(2))
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g)
    )
    # deterministic=True must not need a dropout rng and be reproducible
    o1 = model.apply(params, x, deterministic=True)
    o2 = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_patch_dropout():
    """PatchDropout parity (reference `simple/arch.py:240-246,473` — timm
    semantics): identity at eval; at train time keeps max(1, int(L*(1-rate)))
    non-prefix tokens per sample, prefix tokens always survive."""
    model = _tiny_vit(patch_drop_rate=0.5)
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)

    # eval path: identity — logits match the rate-0 model bit-exactly
    ref = _tiny_vit(patch_drop_rate=0.0)
    out_eval = model.apply(params, x, deterministic=True)
    out_ref = ref.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_ref))

    # train path: runs with a dropout rng and keeps static shapes under jit
    fwd = jax.jit(
        lambda p, x, k: model.apply(
            p, x, deterministic=False, rngs={"dropout": k}
        )
    )
    out_train = fwd(params, x, jax.random.key(1))
    assert out_train.shape == (2, 10)
    assert np.isfinite(np.asarray(out_train)).all()

    # the kept-token count itself: 16 tokens, rate 0.5 -> 8 kept (+ cls)
    feats = model.apply(
        params,
        x,
        deterministic=False,
        rngs={"dropout": jax.random.key(2)},
        method=model.forward_features,
    )
    assert feats.shape == (2, 1 + 8, 48)

    # different rngs drop different tokens -> different logits
    out_b = fwd(params, x, jax.random.key(3))
    assert not np.allclose(np.asarray(out_train), np.asarray(out_b))
