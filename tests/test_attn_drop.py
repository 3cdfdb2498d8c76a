"""Attention-probability dropout (reference `attn_drop`).

The reference threads attn_drop into every attention branch (SDPA
`dropout_p` and the xformers/einsum paths,
`/root/reference/src/UCF_VIT/simple/building_blocks.py:163-187`). Round 3
accepted the YAML knob and silently ignored it; round 4 implemented the
einsum path with torch-SDPA semantics (drop post-softmax probs, rescale by
1/(1-p)); round 5 added dropout inside the Pallas flash kernel
(tests/test_flash_dropout.py), so only the XLA path
(jax.nn.dot_product_attention, no dropout parameter) still hard-errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.models.blocks import Attention
from ucf_vit_tpu.ops.attention import AttnImpl, einsum_attention, multi_head_attention


def _qkv(b=2, h=3, n=16, d=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    return mk(), mk(), mk()


def test_drop_semantics_exact():
    """With v = identity, the output rows ARE the dropped probability matrix:
    every element must be either 0 or p/keep (torch SDPA semantics)."""
    b, h, n = 1, 1, 12
    q, k, _ = _qkv(b, h, n, n)
    v = jnp.eye(n, dtype=jnp.float32)[None, None]
    rate = 0.3
    p_ref = einsum_attention(q, k, v, sm_scale=0.5)  # no drop: plain probs
    p_drop = einsum_attention(
        q, k, v, sm_scale=0.5, dropout_rate=rate, dropout_rng=jax.random.key(7)
    )
    p_ref, p_drop = np.asarray(p_ref), np.asarray(p_drop)
    scaled = p_ref / (1.0 - rate)
    is_zero = np.isclose(p_drop, 0.0, atol=1e-7)
    is_scaled = np.isclose(p_drop, scaled, rtol=1e-5, atol=1e-7)
    assert np.all(is_zero | is_scaled), "elements must be 0 or p/(1-rate)"
    frac = is_zero.mean()
    assert 0.2 < frac < 0.4, f"zero fraction {frac} far from rate {rate}"


def test_drop_unbiased_vs_torch_sdpa():
    """E[dropped attention] == no-drop attention; match torch SDPA's
    dropout_p Monte-Carlo mean on identical inputs."""
    torch = pytest.importorskip("torch")
    q, k, v = _qkv(n=8, d=4)
    rate = 0.4
    sm = 0.5
    base = np.asarray(einsum_attention(q, k, v, sm_scale=sm))

    n_mc = 400
    acc = np.zeros_like(base)
    for i in range(n_mc):
        acc += np.asarray(
            einsum_attention(
                q, k, v, sm_scale=sm, dropout_rate=rate,
                dropout_rng=jax.random.key(i),
            )
        )
    ours = acc / n_mc

    tq, tk, tv = (torch.tensor(np.asarray(a)) for a in (q, k, v))
    torch.manual_seed(0)
    tacc = torch.zeros_like(tv)
    with torch.no_grad():
        for _ in range(n_mc):
            tacc += torch.nn.functional.scaled_dot_product_attention(
                tq, tk, tv, dropout_p=rate, scale=sm
            )
    theirs = tacc.numpy() / n_mc

    scale = np.abs(base).mean()
    assert np.abs(ours - base).mean() < 0.15 * scale, "ours biased vs no-drop"
    assert np.abs(theirs - base).mean() < 0.15 * scale, "torch disagrees with base?"
    assert np.abs(ours - theirs).mean() < 0.2 * scale


def test_explicit_xla_path_raises():
    """jax.nn.dot_product_attention has no dropout parameter: an explicit
    XLA request with attn_drop > 0 must fail loudly, never silently no-op."""
    q, k, v = _qkv()
    for impl in (AttnImpl.XLA, "DEFAULT"):
        with pytest.raises(ValueError, match="attn_drop"):
            multi_head_attention(
                q, k, v, impl=impl, dropout_rate=0.1,
                dropout_rng=jax.random.key(0),
            )


def test_explicit_flash_path_drops():
    """Round 5: an explicit FLASH request with attn_drop > 0 runs the
    in-kernel hash-mask dropout (no error, output differs from no-drop)."""
    q, k, v = _qkv(n=32)
    base = multi_head_attention(q, k, v, impl=AttnImpl.FLASH, interpret=True)
    dropped = multi_head_attention(
        q, k, v, impl=AttnImpl.FLASH, interpret=True, dropout_rate=0.3,
        dropout_rng=jax.random.key(0),
    )
    assert np.isfinite(np.asarray(dropped)).all()
    assert not np.allclose(np.asarray(dropped), np.asarray(base))


def test_auto_routes_to_einsum_and_module_plumbs():
    """Attention module: train mode with attn_drop>0 must (a) run, (b) vary
    with the dropout rng, (c) equal the no-drop output when deterministic."""
    b, n, dim, heads = 2, 10, 16, 4
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, n, dim)), jnp.float32)
    mod = Attention(dim=dim, num_heads=heads, attn_impl=AttnImpl.AUTO, attn_drop=0.25)
    params = mod.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False)

    det = mod.apply(params, x, True)
    no_drop = Attention(dim=dim, num_heads=heads, attn_impl=AttnImpl.AUTO).apply(
        params, x, True
    )
    np.testing.assert_allclose(np.asarray(det), np.asarray(no_drop), atol=1e-6)

    y1 = mod.apply(params, x, False, rngs={"dropout": jax.random.key(2)})
    y2 = mod.apply(params, x, False, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), "dropout inactive"
    assert not np.allclose(np.asarray(y1), np.asarray(det)), "dropout inactive"
