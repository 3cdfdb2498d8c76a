"""Sin-cos positional embeddings (host-side numpy, used only at init time).

Capability parity with the reference `src/UCF_VIT/utils/pos_embed.py:37-102`
(1D/2D/3D sincos grids, MAE/MoCo-v3 layout) and `pos_embed.py:16-28`
(diffusion time-step sinusoidal table). These run once at parameter-init time
on the host, so plain numpy is the right tool; nothing here touches the TPU.
"""

from __future__ import annotations

import math

import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] embedding, sin block then cos block."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega  # (D/2,)

    pos = np.asarray(pos, dtype=np.float64).reshape(-1)  # (M,)
    out = np.einsum("m,d->md", pos, omega)  # (M, D/2)

    return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (M, D)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size_h: int, grid_size_w: int, cls_token: bool = False
) -> np.ndarray:
    """[gh*gw(+1), embed_dim]; first half of dims encode h, second half w."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size_h, dtype=np.float32)
    grid_w = np.arange(grid_size_w, dtype=np.float32)
    # Row-major over (h, w): token order matches patchify's "nhwpqc" layout.
    ww, hh = np.meshgrid(grid_w, grid_h)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, hh)
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, ww)
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def get_3d_sincos_pos_embed(
    embed_dim: int,
    grid_size_h: int,
    grid_size_w: int,
    grid_size_d: int,
    cls_token: bool = False,
) -> np.ndarray:
    """[gh*gw*gd(+1), embed_dim]; dims split in thirds over (h, w, d).

    Token order is h-major, then w, then d — matching the 3D patchify layout
    ("nhwdpqrc").
    """
    assert embed_dim % 3 == 0
    d_pos = get_1d_sincos_pos_embed_from_grid(embed_dim // 3, np.arange(grid_size_d))
    w_pos = get_1d_sincos_pos_embed_from_grid(embed_dim // 3, np.arange(grid_size_w))
    h_pos = get_1d_sincos_pos_embed_from_grid(embed_dim // 3, np.arange(grid_size_h))

    d_pos = np.tile(d_pos, (grid_size_h * grid_size_w, 1))
    w_pos = np.tile(np.repeat(w_pos, grid_size_d, axis=0), (grid_size_h, 1))
    h_pos = np.repeat(h_pos, grid_size_w * grid_size_d, axis=0)

    emb = np.concatenate((h_pos, w_pos, d_pos), axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb


def sinusoidal_time_embedding_table(time_steps: int, embed_dim: int) -> np.ndarray:
    """[time_steps, embed_dim] interleaved sin/cos table for DDPM time steps.

    Layout parity with the reference's `SinusoidalEmbeddings` (interleaved —
    even dims sin, odd dims cos), distinct from the block layout used by the
    spatial sincos embeddings above.
    """
    position = np.arange(time_steps, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float64) * -(math.log(10000.0) / embed_dim)
    )
    table = np.zeros((time_steps, embed_dim), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div)
    table[:, 1::2] = np.cos(position * div)
    return table


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution weights for the 4 taps around fractional offset t
    (Keys kernel with A=-0.75 — torch/OpenCV bicubic). [N] -> [N, 4]."""
    # tap distances: |x| = 1+t, t, 1-t, 2-t  (taps at floor-1 .. floor+2)
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def near(x):  # |x| <= 1
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0

    def far(x):  # 1 < |x| < 2
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a

    return np.stack([far(d0), near(d1), near(d2), far(d3)], axis=-1)


def _axis_resample_bicubic(arr: np.ndarray, axis: int, new_len: int) -> np.ndarray:
    """Separable 1-axis pass of torch F.interpolate(mode='bicubic',
    align_corners=False): half-pixel centers, edge-replicated taps."""
    old_len = arr.shape[axis]
    scale = old_len / new_len
    coords = (np.arange(new_len, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    t = coords - base
    w = _cubic_weights(t)  # [new_len, 4]
    out = None
    for tap in range(4):
        idx = np.clip(base - 1 + tap, 0, old_len - 1)
        shape = [1] * arr.ndim
        shape[axis] = new_len
        piece = np.take(arr, idx, axis=axis) * w[:, tap].reshape(shape)
        out = piece if out is None else out + piece
    return out


def interpolate_pos_embed_2d(
    pos_embed: np.ndarray, new_grid: tuple, w_h_ratio: int = 2
) -> np.ndarray:
    """Bicubic 2D resampling of a [1, H*W, D] pos-embed table to a new grid —
    exact torch F.interpolate(mode='bicubic', align_corners=False) semantics,
    matching the reference (`utils/pos_embed.py:108-131`, DeiT-style; the
    reference assumes W = w_h_ratio * H). Parity pinned against the live
    torch op in tests/test_ddpm_interp.py."""
    _, orig_num, dim = pos_embed.shape
    orig_h = int((orig_num // w_h_ratio) ** 0.5)
    orig_w = w_h_ratio * orig_h
    new_h, new_w = new_grid
    if (orig_h, orig_w) == (new_h, new_w):
        return pos_embed
    grid = pos_embed.reshape(orig_h, orig_w, dim).astype(np.float64)
    grid = _axis_resample_bicubic(grid, 0, new_h)
    grid = _axis_resample_bicubic(grid, 1, new_w)
    return grid.reshape(1, new_h * new_w, dim).astype(pos_embed.dtype)


def interpolate_channel_embed(channel_embed: np.ndarray, new_len: int) -> np.ndarray:
    """Truncate a [1, V, D] per-variable embedding table to new_len variables
    (reference `utils/pos_embed.py:135-140` — truncation only)."""
    if new_len <= channel_embed.shape[1]:
        return channel_embed[:, :new_len]
    return channel_embed


def interpolate_pos_embed_1d(pos_embed: np.ndarray, new_len: int) -> np.ndarray:
    """Linearly resample a [1, L, D] (or [L, D]) pos-embed table to new_len.

    Used when transferring adaptive-patching checkpoints between fixed_length
    settings (reference `utils/misc.py:98-127`). align_corners=False
    semantics: sample centers are mapped affinely between the two grids.
    """
    squeeze = False
    if pos_embed.ndim == 2:
        pos_embed = pos_embed[None]
        squeeze = True
    _, old_len, dim = pos_embed.shape
    if old_len == new_len:
        return pos_embed[0] if squeeze else pos_embed
    # torch F.interpolate(mode="linear", align_corners=False) equivalence:
    scale = old_len / new_len
    coords = (np.arange(new_len, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0, old_len - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, old_len - 1)
    frac = (coords - lo)[None, :, None]
    out = pos_embed[:, lo] * (1 - frac) + pos_embed[:, hi] * frac
    out = out.astype(pos_embed.dtype)
    return out[0] if squeeze else out
