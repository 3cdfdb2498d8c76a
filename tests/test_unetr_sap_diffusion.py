"""Golden-shape tests for UNETR / SAP / DiffusionVIT (reference README
examples `:624-658` (UNETR), `:678-718` (SAP), `:723-772` (DiffusionVIT))."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.models import SAP, UNETR, DiffusionVIT, ddpm_schedule, q_sample
from ucf_vit_tpu.ops.attention import AttnImpl

COMMON = dict(
    in_chans=1,
    embed_dim=48,
    depth=4,
    num_heads=4,
    mlp_ratio=4,
    class_token=False,
    default_vars=("v",),
    attn_impl=AttnImpl.EINSUM,
)


def test_unetr_skip_2d_matched_size():
    # img 32, p=16 -> feat 2; feat*16 == img -> decoder2 upsamples
    model = UNETR(img_size=(32, 32), patch_size=16, num_classes=3,
                  skip_connection=True, feature_size=4, twoD=True, **COMMON)
    x = jnp.ones((2, 1, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 3, 32, 32)


def test_unetr_skip_2d_resize_path():
    # img 32, p=8 -> feat 4; feat*16 = 64 != 32 -> align-corners resize path
    model = UNETR(img_size=(32, 32), patch_size=8, num_classes=2,
                  skip_connection=True, feature_size=4, twoD=True, **COMMON)
    x = jnp.ones((1, 1, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2, 32, 32)


def test_unetr_no_skip():
    model = UNETR(img_size=(32, 32), patch_size=16, num_classes=2,
                  skip_connection=False, feature_size=4, twoD=True, **COMMON)
    x = jnp.ones((1, 1, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2, 32, 32)


def test_unetr_linear_decoder():
    model = UNETR(img_size=(32, 32), patch_size=8, num_classes=2,
                  skip_connection=False, linear_decoder=True, twoD=True, **COMMON)
    x = jnp.ones((1, 1, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2, 32, 32)


def test_unetr_adaptive_3d():
    # fixed_length 8 -> sqrt_len 2; x_seq is the reassembled 8^3 image (p=4)
    model = UNETR(img_size=(16, 16, 16), patch_size=4, num_classes=2,
                  skip_connection=True, feature_size=2, twoD=False,
                  adaptive_patching=True, fixed_length=8, sqrt_len_method=True,
                  use_adaptive_pos_emb=True, **COMMON)
    x = jnp.ones((1, 1, 16, 16, 16))
    x_seq = jnp.ones((1, 1, 8, 8, 8))
    seq_ps = jnp.ones((1, 8, 4))
    params = model.init(jax.random.key(0), x, None, seq_ps, x_seq)
    out = model.apply(params, x, None, seq_ps, x_seq)
    assert out.shape == (1, 2, 16, 16, 16)


def test_sap_plain_and_adaptive():
    model = SAP(img_size=(32, 32), patch_size=8, num_classes=2, twoD=True, **COMMON)
    x = jnp.ones((1, 1, 32, 32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2, 32, 32)

    model = SAP(img_size=(32, 32), patch_size=8, num_classes=2, twoD=True,
                adaptive_patching=True, fixed_length=4, sqrt_len_method=True,
                use_adaptive_pos_emb=True, **COMMON)
    x = jnp.ones((1, 1, 16, 16))  # sqrt_len 2 * p 8
    seq_ps = jnp.ones((1, 4, 3))
    params = model.init(jax.random.key(0), x, None, seq_ps)
    out = model.apply(params, x, None, seq_ps)
    assert out.shape == (1, 2, 16, 16)


def test_diffusion_vit_and_ddpm():
    model = DiffusionVIT(img_size=(32, 32), patch_size=8, twoD=True,
                         decoder_depth=1, decoder_embed_dim=24,
                         decoder_num_heads=4, time_steps=50, **COMMON)
    sched = ddpm_schedule(50)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 1, 32, 32)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    t = jnp.asarray([3, 40])
    xt = q_sample(sched, x0, t, noise)
    assert xt.shape == x0.shape
    # higher t -> closer to pure noise
    a = np.asarray(sched.alpha_bar)
    assert a[40] < a[3]

    params = model.init(jax.random.key(0), xt, t)
    out = model.apply(params, xt, t)
    assert out.shape == (2, 16, 64)  # [B, L, p^2 * C]

    # grads flow through the time-embedding path
    def loss_fn(p):
        pred = model.apply(p, xt, t)
        return jnp.mean(pred**2)

    g = jax.grad(loss_fn)(params)
    tmap = g["params"]["time_embedding_map"]
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(tmap))
    assert gsum > 0


def test_reassemble_sqrt_len_block_layout():
    """Token i must land as the i-th row-major pxp(xp) block — shared by the
    train step and the inference CLI (round-1 regression: the inference SAP
    3D branch used a plain reshape that scrambled pixel locality)."""
    from ucf_vit_tpu.tasks import reassemble_sqrt_len

    # 2D: image of side sqrt_len*p cut into row-major blocks
    s, p = 3, 4
    img = np.arange(1 * 2 * (s * p) ** 2, dtype=np.float32).reshape(
        1, 2, s * p, s * p
    )
    tokens = (
        img.reshape(1, 2, s, p, s, p)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(1, 2, s * s, p * p)
    )
    out = np.asarray(reassemble_sqrt_len(jnp.asarray(tokens), s, p, True))
    np.testing.assert_array_equal(out, img)

    # 3D
    vol = np.arange((s * p) ** 3, dtype=np.float32).reshape(
        1, 1, s * p, s * p, s * p
    )
    tokens3 = (
        vol.reshape(1, 1, s, p, s, p, s, p)
        .transpose(0, 1, 2, 4, 6, 3, 5, 7)
        .reshape(1, 1, s ** 3, p ** 3)
    )
    out3 = np.asarray(reassemble_sqrt_len(jnp.asarray(tokens3), s, p, False))
    np.testing.assert_array_equal(out3, vol)


def test_trainer_and_inference_share_reassembly():
    """The inference CLI must feed the model the same reassembled input the
    training step does (both route through tasks.reassemble_sqrt_len)."""
    import inspect

    from ucf_vit_tpu import inference, tasks

    src = inspect.getsource(inference)
    assert "reassemble_sqrt_len" in src
    # no stray local reshape of seq into an image in inference
    assert ".reshape((b, c) + (side,)" not in src


def test_unetr_decoder_remat_grads_match():
    """trainer.remat wraps the conv decoder blocks in nn.remat (the 3D
    decoder's activations are the OOM driver at the shipped 64^3 config —
    BASELINE.md r3: bs>=4 fits only with remat). Remat must be a pure
    memory/compute trade: same params pytree, same forward, gradients equal
    up to f32 reassociation. Conv biases feeding InstanceNorm have
    mathematically-zero gradients (the norm subtracts the mean), so both
    sides are pure rounding noise there — those leaves are excluded by a
    global-scale cutoff rather than compared."""
    kw = dict(img_size=(16, 16, 16), patch_size=4, num_classes=3,
              skip_connection=True, feature_size=4, twoD=False, **COMMON)
    m0 = UNETR(**kw, remat=False)
    m1 = UNETR(**kw, remat=True)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 1, 16, 16, 16)), jnp.float32)
    y = jnp.asarray(r.integers(0, 3, size=(2, 16, 16, 16)), jnp.int32)

    from ucf_vit_tpu.parallel.train_step import unbox

    params = unbox(m0.init(jax.random.key(0), x)["params"])

    def loss(m):
        def f(p):
            lse = jax.nn.log_softmax(m.apply({"params": p}, x), axis=1)
            return -jnp.mean(jnp.take_along_axis(lse, y[:, None], axis=1))
        return f

    l0, g0 = jax.jit(jax.value_and_grad(loss(m0)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss(m1)))(params)
    assert np.isclose(float(l0), float(l1), rtol=0, atol=1e-6)
    leaves0, leaves1 = jax.tree.leaves(unbox(g0)), jax.tree.leaves(unbox(g1))
    gmax = max(float(jnp.max(jnp.abs(a))) for a in leaves0)
    for a, b in zip(leaves0, leaves1):
        scale = float(jnp.max(jnp.abs(a)))
        ad = float(jnp.max(jnp.abs(a - b)))
        # relative term for healthy leaves; absolute floor (vs the global
        # gradient scale) absorbs the noise-vs-noise leaves — a real remat
        # bug produces O(scale) errors on the large leaves, far above both
        assert ad <= 5e-4 * scale + 3e-5 * gmax, (ad, scale, gmax)
