"""Flash-attention kernel numerics vs the einsum oracle (pallas interpret
mode on CPU — the reference's FusedAttn.NONE path is exactly this oracle,
`simple/building_blocks.py:181-187`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.ops.attention import AttnImpl, einsum_attention, multi_head_attention
from ucf_vit_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, h=2, n=197, dh=32, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, n, dh)), dtype)
    return mk(), mk(), mk()


def test_flash_forward_matches_einsum_unaligned_len():
    q, k, v = _qkv(n=197)  # 197 tokens: exercises the padding/mask path
    out_ref = einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_flash_backward_matches_einsum():
    q, k, v = _qkv(n=130, dh=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5)


def test_flash_bf16_tolerance():
    q, k, v = _qkv(n=128, dh=64, dtype=jnp.bfloat16)
    out_ref = einsum_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        sm_scale=q.shape[-1] ** -0.5,
    )
    out = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-2)


def test_sharded_flash_matches_einsum():
    """shard_map-wrapped kernel on the 8-device CPU mesh (dp x tp x sp) ==
    single-device einsum (the sequence-parallel attention path)."""
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context

    q, k, v = _qkv(b=4, h=2, n=256, dh=16)
    ref = einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5)

    mesh = make_mesh(2, 1, 2, 2)  # ddp 2 x sp 2 x tp 2
    with mesh_context(mesh):
        out = jax.jit(
            lambda q, k, v: multi_head_attention(
                q, k, v, impl=AttnImpl.FLASH, interpret=True
            )
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_sp_flash_matches_einsum():
    """sp>1 with head count divisible -> Ulysses a2a path."""
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context

    # H=4, tp=1, sp=2: local_heads 4 % 2 == 0 -> Ulysses
    q, k, v = _qkv(b=4, h=4, n=256, dh=16, seed=3)
    ref = einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5)
    mesh = make_mesh(2, 1, 2, 2)
    with mesh_context(mesh):
        out = jax.jit(
            lambda q, k, v: multi_head_attention(
                q, k, v, impl=AttnImpl.FLASH, interpret=True
            )
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_matches_einsum():
    """Ring attention (rotating KV via ppermute) on the sp axis == einsum,
    forward and backward."""
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context

    q, k, v = _qkv(b=2, h=3, n=256, dh=16, seed=5)  # h=3: Ulysses ineligible
    ref = einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5)

    mesh = make_mesh(2, 1, 4, 1)  # ddp 2 x sp 4
    with mesh_context(mesh):
        fn = jax.jit(
            lambda q, k, v: multi_head_attention(
                q, k, v, impl=AttnImpl.FLASH, interpret=True, sp_mode="ring"
            )
        )
        out = fn(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        g = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(
                    multi_head_attention(
                        q, k, v, impl=AttnImpl.FLASH, interpret=True,
                        sp_mode="ring",
                    )
                    ** 2
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(
                einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_backward_matches_two_kernel():
    """The single-pass fused backward (dq+dk+dv in one kernel) must produce
    the same gradients as the two-kernel fallback it replaces. Exercises a
    multi-block grid (several q and kv blocks) and an unaligned length."""
    import ucf_vit_tpu.ops.flash_attention as fa

    for n in (384, 300):  # 384 -> 3 q-blocks x 3 kv-blocks at block 128
        q, k, v = _qkv(n=n, dh=16)

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2
            )

        saved = fa.FUSED_BWD_DQ_SCRATCH_BYTES
        try:
            fa.FUSED_BWD_DQ_SCRATCH_BYTES = 6 * 1024 * 1024
            fa._flash_len_cache.cache_clear()
            g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            fa.FUSED_BWD_DQ_SCRATCH_BYTES = 0  # force the fallback
            fa._flash_len_cache.cache_clear()
            g_two = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fa.FUSED_BWD_DQ_SCRATCH_BYTES = saved
            fa._flash_len_cache.cache_clear()
        for a, b in zip(g_fused, g_two):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bwd_block_k_vmem_guard():
    """Long-N fused backward halves the kv block so the scoped-VMEM total
    (full-sequence dq scratch + 5 block_q x block_k f32 intermediates) stays
    under the 16 MB limit; short-N shapes keep the measured-fastest 1024."""
    from ucf_vit_tpu.ops.flash_attention import _bwd_block_k

    # fused regime (dq scratch fits): the benchmarked 4k shapes keep 1024
    assert _bwd_block_k(4096, 64, 512, 1024, 4096, fused=True) == 1024
    # fused long-N: flat 512 cap so dq scratch + intermediates fit
    assert _bwd_block_k(12288, 48, 512, 1024, 12288, fused=True) == 512
    # two-kernel long-N: product cap — bq=1024 resolves bk to 512, but a
    # narrower q block leaves room for a wider kv block (now honorable)
    assert _bwd_block_k(32768, 96, 1024, 1024, 32768, fused=False) == 512
    assert _bwd_block_k(32768, 96, 512, 1024, 32768, fused=False) == 1024
    assert _bwd_block_k(32768, 96, 2048, 1024, 32768, fused=False) == 256
    assert _bwd_block_k(32768, 48, 1024, 256, 32768, fused=False) == 256  # never grows
    # the clamp result must divide n_kv_pad, else the trailing kv block's
    # dk/dv would never be written (review r3: q 8448 x kv 640 -> NaN dk)
    assert _bwd_block_k(32768, 48, 1024, 640, 640, fused=False) == 320
    assert _bwd_block_k(128, 48, 128, 640, 640, fused=True) == 640  # unclamped


def test_bwd_block_k_clamp_divides_kv_pad():
    """Cross-attention where the backward clamp (block_k -> 512) does not
    divide n_kv_pad: gradients must still cover every key. Reproduces the
    review-r3 bug (dk NaN/zero for keys past the last full 512 block) at
    small scale by lowering the clamp threshold."""
    import ucf_vit_tpu.ops.flash_attention as fa

    q, _, _ = _qkv(b=1, h=1, n=128, dh=16)
    _, k, v = _qkv(b=1, h=1, n=600, dh=16, seed=1)  # pads to 640

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, sm_scale=q.shape[-1] ** -0.5) ** 2)

    saved = fa.BWD_BLOCK_K_CLAMP_BYTES
    try:
        fa.BWD_BLOCK_K_CLAMP_BYTES = 0  # force the clamp at this tiny shape
        fa._flash_len_cache.cache_clear()
        g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.BWD_BLOCK_K_CLAMP_BYTES = saved
        fa._flash_len_cache.cache_clear()
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
