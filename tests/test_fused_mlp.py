"""Numerics for the fused-MLP Pallas kernel study (ops/fused_mlp.py).

The kernel is a measured negative result kept as a study artifact — XLA
already runs the ViT-B MLP at the hand-written megakernel's speed (see
BASELINE.md round 3) — but while in-tree its numerics must stay correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucf_vit_tpu.ops.fused_mlp import fits_vmem, fused_mlp, fused_mlp_reference


@pytest.mark.parametrize("m,d,h,bm", [(512, 256, 1024, 256), (300, 128, 512, 128)])
def test_fused_mlp_matches_reference(m, d, h, bm):
    """Interpret-mode kernel == unfused oracle to bf16 tolerance, including
    the M-padding path (m=300 is not a block_m multiple)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.bfloat16)

    got = fused_mlp(x, w1, b1, w2, b2, block_m=bm, interpret=True)
    want = fused_mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_fused_mlp_leading_dims():
    """[B, N, D] inputs flatten/unflatten through the wrapper."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 70, 128)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(128, 512)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((512,), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(512, 128)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((128,), jnp.bfloat16)
    got = fused_mlp(x, w1, b1, w2, b2, block_m=128, interpret=True)
    assert got.shape == x.shape
    want = fused_mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_fits_vmem_budget():
    assert fits_vmem(768, 3072)  # ViT-B
    assert not fits_vmem(1024, 4096)  # ViT-L MLP weights exceed residency budget
