"""Dropout inside the Pallas flash-attention kernel (round 5).

The reference runs `attn_drop > 0` through its fused FLASH/CK kernels at any
sequence length (`/root/reference/src/UCF_VIT/simple/building_blocks.py:163-174`).
The TPU rebuild regenerates a stateless hash mask from global (row, col,
batch-head) coordinates inside the forward AND backward kernels
(ops/attn_dropout.py; ops/flash_attention.py) — no mask storage, no tile-size
coupling. These tests pin:

  (a) dropped-fraction statistics of the hash mask,
  (b) forward + all three gradients equal the einsum oracle given the SAME
      dense mask,
  (c) determinism per seed, sensitivity across seeds,
  (d) block-size independence (the property that lets the backward clamp its
      kv block independently of the forward),
  (e) the sequence-parallel paths (ring / gather / ulysses) under dropout.

All on the CPU interpret path, which executes the identical uint32 integer
arithmetic as the compiled TPU kernel (verified bit-identical on-chip; see
BASELINE.md round-5 dropout rows for the chip overhead measurement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.ops.attn_dropout import dense_keep_mask, keep_mask
from ucf_vit_tpu.ops.attention import AttnImpl, einsum_attention, multi_head_attention
from ucf_vit_tpu.ops.flash_attention import flash_attention


def _qkv(b=1, h=2, n=256, dh=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, n, dh)), dtype)
    return mk(), mk(), mk()


def _oracle(q, k, v, sm, seed, rate):
    """Einsum attention with the EXACT mask the kernel regenerates."""
    b, h, n, _ = q.shape
    n_kv = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * sm, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    z = dense_keep_mask(seed, b * h, n, n_kv, rate).reshape(b, h, n, n_kv)
    p = jnp.where(z, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def test_mask_statistics():
    """Keep fraction tracks 1 - rate; rows/cols/bh decorrelated."""
    for rate in (0.1, 0.25, 0.5):
        z = np.asarray(dense_keep_mask(123, 4, 256, 256, rate))
        frac = 1.0 - z.mean()
        assert abs(frac - rate) < 0.01, f"drop fraction {frac} vs rate {rate}"
        # per-row and per-bh keep fractions should all be near 1-rate
        row_keep = z.mean(axis=-1)
        assert abs(row_keep.min() - (1 - rate)) < 0.15
        assert abs(row_keep.max() - (1 - rate)) < 0.15
        bh_keep = z.mean(axis=(1, 2))
        assert np.all(np.abs(bh_keep - (1 - rate)) < 0.02)
    # different bh planes are different masks
    z = np.asarray(dense_keep_mask(7, 3, 64, 64, 0.3))
    assert not np.array_equal(z[0], z[1]) and not np.array_equal(z[1], z[2])


def test_fwd_and_grads_match_einsum_with_same_mask():
    b, h, n, dh = 2, 3, 300, 32  # unaligned length: padding + kv-mask branch
    q, k, v = _qkv(b, h, n, dh, seed=1)
    rate, seed, sm = 0.2, 99, dh ** -0.5

    def flash(q, k, v):
        return flash_attention(
            q, k, v, sm_scale=sm, dropout_rate=rate, dropout_seed=seed,
            interpret=True,
        )

    o_ref = _oracle(q, k, v, sm, seed, rate)
    o = flash(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)

    g_ref = jax.grad(
        lambda *a: (_oracle(*a, sm, seed, rate) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    g = jax.grad(lambda *a: (flash(*a) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=3e-5 * scale,
            err_msg=f"d{name} mismatch",
        )


def test_determinism_and_seed_sensitivity():
    q, k, v = _qkv(n=128)
    kw = dict(sm_scale=0.125, dropout_rate=0.3, interpret=True)
    a = flash_attention(q, k, v, dropout_seed=5, **kw)
    b = flash_attention(q, k, v, dropout_seed=5, **kw)
    c = flash_attention(q, k, v, dropout_seed=6, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "same seed must repeat"
    assert not np.array_equal(np.asarray(a), np.asarray(c)), "seed must matter"


def test_block_size_independence():
    """The mask hashes GLOBAL coordinates, so retiling must not change the
    result — this is what lets the backward clamp its kv block independently
    of the forward (and a future forward re-tune without breaking grads)."""
    q, k, v = _qkv(n=512, dh=32, seed=2)
    kw = dict(sm_scale=0.2, dropout_rate=0.25, dropout_seed=11, interpret=True)
    o1 = flash_attention(q, k, v, block_q=128, block_k=128, **kw)
    o2 = flash_attention(q, k, v, block_q=256, block_k=512, **kw)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-6)


def test_keep_mask_offset_consistency():
    """keep_mask with a (row0, col0) origin equals the corresponding window
    of the dense mask — the contract the KV-gather SP path and the ring
    chunks rely on."""
    full = np.asarray(keep_mask(42, 3, 0, 0, (64, 64), 0.4))
    window = np.asarray(keep_mask(42, 3, 16, 32, (32, 16), 0.4))
    np.testing.assert_array_equal(window, full[16:48, 32:48])


@pytest.mark.parametrize("mode", ["ring", "gather", "ulysses"])
def test_sp_modes_run_under_dropout(mode):
    """Every sequence-parallel strategy accepts dropout: runs, finite,
    differs from no-drop, deterministic under one rng key."""
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context

    h = 8 if mode == "ulysses" else 3  # ulysses needs heads % sp == 0
    q, k, v = _qkv(b=2, h=h, n=128, dh=16, seed=4)
    mesh = make_mesh(2, 1, 4, 1)  # ddp 2 x sp 4

    def run(rng, rate):
        with mesh_context(mesh):
            return multi_head_attention(
                q, k, v, impl=AttnImpl.FLASH, interpret=True, sp_mode=mode,
                dropout_rate=rate, dropout_rng=rng,
            )

    base = run(None, 0.0)
    d1 = run(jax.random.key(0), 0.3)
    d2 = run(jax.random.key(0), 0.3)
    d3 = run(jax.random.key(1), 0.3)
    assert np.isfinite(np.asarray(d1)).all()
    assert not np.allclose(np.asarray(d1), np.asarray(base)), "dropout inert"
    assert np.array_equal(np.asarray(d1), np.asarray(d2)), "not deterministic"
    assert not np.array_equal(np.asarray(d1), np.asarray(d3)), "rng ignored"


def test_ring_dropout_grads_match_gather():
    """Ring and KV-gather cover the same global coordinates with the same
    seed, so under dropout their outputs AND gradients must agree — the
    strongest cross-check that each strategy's mask bookkeeping is the one
    global Bernoulli draw it claims to be."""
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context

    q, k, v = _qkv(b=1, h=2, n=128, dh=16, seed=6)
    mesh = make_mesh(1, 1, 4, 1)  # sp 4 only: identical seed folding
    rng = jax.random.key(3)

    def loss(mode):
        def f(q, k, v):
            with mesh_context(mesh):
                o = multi_head_attention(
                    q, k, v, impl=AttnImpl.FLASH, interpret=True,
                    sp_mode=mode, dropout_rate=0.2, dropout_rng=rng,
                )
            return (o.astype(jnp.float32) ** 2).sum()

        return f

    o_ring = jax.value_and_grad(loss("ring"), argnums=(0, 1, 2))(q, k, v)
    o_gath = jax.value_and_grad(loss("gather"), argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(o_ring[0]), float(o_gath[0]), rtol=1e-5)
    for name, a, b_ in zip("qkv", o_ring[1], o_gath[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5,
            err_msg=f"d{name}: ring vs gather under one mask",
        )


def test_attention_module_flash_dropout():
    """models/blocks.Attention with attn_impl=FLASH + attn_drop > 0: train
    mode drops (varies with rng), eval mode is exact."""
    from ucf_vit_tpu.models.blocks import Attention

    b, n, dim, heads = 2, 64, 32, 4
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, n, dim)), jnp.float32)
    mod = Attention(dim=dim, num_heads=heads, attn_impl=AttnImpl.FLASH, attn_drop=0.25)
    params = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False
    )
    det = mod.apply(params, x, True)
    y1 = mod.apply(params, x, False, rngs={"dropout": jax.random.key(2)})
    y2 = mod.apply(params, x, False, rngs={"dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(y1)).all()
    assert not np.allclose(np.asarray(y1), np.asarray(det)), "dropout inert"
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), "rng ignored"
