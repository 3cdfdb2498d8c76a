"""MAE golden-shape + masking-invariant tests (reference README `:552-592`)."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.models.mae import MAE
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.ops.patchify import patchify
from ucf_vit_tpu.utils.metrics import masked_mse


def _tiny_mae(**kw):
    cfg = dict(
        img_size=(32, 32),
        patch_size=8,
        in_chans=3,
        embed_dim=48,
        depth=2,
        num_heads=4,
        mlp_ratio=4,
        twoD=True,
        class_token=False,
        default_vars=("a", "b", "c"),
        mask_ratio=0.75,
        decoder_depth=1,
        decoder_embed_dim=24,
        decoder_num_heads=4,
        mlp_ratio_decoder=4,
        attn_impl=AttnImpl.EINSUM,
    )
    cfg.update(kw)
    return MAE(**cfg)


def test_mae_shapes_and_mask_ratio():
    model = _tiny_mae()
    x = jnp.ones((2, 3, 32, 32))
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = model.init(rngs, x)
    pred, mask = model.apply(params, x, rngs={"mask": jax.random.key(2)})
    L = 16  # (32/8)^2
    assert pred.shape == (2, L, 8 * 8 * 3)
    assert mask.shape == (2, L)
    # exactly L - len_keep tokens masked per sample
    expected_masked = L - int(L * 0.25)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), expected_masked)


def test_mae_deterministic_noise_reproducible():
    model = _tiny_mae()
    x = jnp.ones((1, 3, 32, 32))
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = model.init(rngs, x)
    noise = jnp.asarray(np.random.default_rng(0).random((1, 16)), jnp.float32)
    p1, m1 = model.apply(params, x, mask_noise=noise)
    p2, m2 = model.apply(params, x, mask_noise=noise)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0)


def test_mae_linear_decoder():
    model = _tiny_mae(linear_decoder=True)
    x = jnp.ones((2, 3, 32, 32))
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = model.init(rngs, x)
    pred, mask = model.apply(params, x, rngs={"mask": jax.random.key(2)})
    assert pred.shape == (2, 16, 192)


def test_mae_adaptive():
    fixed_length = 13
    model = _tiny_mae(
        adaptive_patching=True,
        fixed_length=fixed_length,
        use_adaptive_pos_emb=True,
    )
    x = jnp.ones((2, 3, fixed_length, 64))
    seq_ps = jnp.ones((2, fixed_length, 3))
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = model.init(rngs, x, None, seq_ps)
    pred, mask = model.apply(params, x, None, seq_ps, rngs={"mask": jax.random.key(2)})
    assert pred.shape == (2, fixed_length, 192)


def test_masked_mse_only_counts_masked():
    pred = jnp.zeros((1, 4, 2))
    target = jnp.ones((1, 4, 2))
    mask = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    # only token 0 counted: (0-1)^2 = 1
    assert float(masked_mse(pred, target, mask)) == 1.0


def test_mae_loss_pipeline():
    model = _tiny_mae()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32)
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = model.init(rngs, x)

    def loss_fn(p):
        pred, mask = model.apply(p, x, rngs={"mask": jax.random.key(3)})
        target = patchify(x, 8, twoD=True)
        return masked_mse(pred, target, mask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(grads))


def test_mae_seq_pack_matches_unpacked():
    """seq_pack folds several samples' kept tokens into one encoder sequence
    with block-diagonal attention — the output must match the unpacked model
    exactly (same params, same mask noise)."""
    m1 = _tiny_mae()
    m4 = _tiny_mae(seq_pack=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 32, 32)), jnp.float32)
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = m1.init(rngs, x)
    noise = jax.random.uniform(jax.random.key(7), (4, 16))
    p1, k1 = m1.apply(params, x, mask_noise=noise)
    p4, k4 = m4.apply(params, x, mask_noise=noise)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k4))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p4), atol=1e-5)


def test_mae_seq_pack_xla_impl_matches():
    """The XLA dot_product_attention path honors the segment mask too."""
    m1 = _tiny_mae()
    m4 = _tiny_mae(seq_pack=2, attn_impl=AttnImpl.XLA)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 32, 32)), jnp.float32)
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}
    params = m1.init(rngs, x)
    noise = jax.random.uniform(jax.random.key(3), (2, 16))
    p1, _ = m1.apply(params, x, mask_noise=noise)
    p2, _ = m4.apply(params, x, mask_noise=noise)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
