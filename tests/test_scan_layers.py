"""scan_layers: lax.scan over blocks produces valid outputs and works in
forward_intermediates; O(1) compile in depth (big-model readiness)."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.models import VIT
from ucf_vit_tpu.ops.attention import AttnImpl


def _vit(scan):
    return VIT(
        img_size=(16, 16), patch_size=8, in_chans=3, num_classes=5,
        embed_dim=16, depth=3, num_heads=2, default_vars=("v",),
        attn_impl=AttnImpl.EINSUM, scan_layers=scan,
    )


def test_scan_layers_forward_and_grads():
    model = _vit(True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 5)
    # stacked block params: leading depth dim
    qkv = params["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    qkv = qkv.unbox() if hasattr(qkv, "unbox") else qkv
    assert qkv.shape[0] == 3  # depth-stacked

    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


def test_scan_layers_intermediates():
    model = _vit(True)
    x = jnp.ones((1, 3, 16, 16))
    params = model.init(jax.random.key(0), x)

    def probe(p, x):
        def inner(mdl, x):
            return mdl.forward_intermediates(x, indices=[0, 2])

        return model.apply(p, x, method=inner)

    out, inter = probe(params, x)
    assert len(inter) == 2
    assert inter[0].shape == (1, 4, 16)  # prefix stripped (cls removed)
