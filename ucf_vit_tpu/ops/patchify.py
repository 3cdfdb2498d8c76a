"""Token <-> image space conversion (2D and 3D).

Capability parity with reference `src/UCF_VIT/utils/misc.py:14-56`
(einsum-based patchify/unpatchify). Implemented with reshape/transpose which
XLA compiles to pure layout changes — zero FLOPs on TPU.

Layout contract (2D): tokens ordered h-major then w; feature dim is
(patch_h, patch_w, channel) flattened, channel fastest.
Layout contract (3D): tokens ordered h, w, d; feature dim is
(ph, pw, pd, channel) flattened.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(data: jnp.ndarray, patch_size: int, twoD: bool) -> jnp.ndarray:
    """[B, C, *spatial] image -> [B, L, p^ndim * C] tokens."""
    p = patch_size
    if twoD:
        b, c, h, w = data.shape
        nh, nw = h // p, w // p
        x = data.reshape(b, c, nh, p, nw, p)
        # nchpwq -> nhwpqc
        x = x.transpose(0, 2, 4, 3, 5, 1)
        return x.reshape(b, nh * nw, p * p * c)
    else:
        b, c, h, w, d = data.shape
        nh, nw, nd = h // p, w // p, d // p
        x = data.reshape(b, c, nh, p, nw, p, nd, p)
        # nchpwqdr -> nhwdpqrc
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, nh * nw * nd, p * p * p * c)


def unpatchify(
    tokens: jnp.ndarray,
    image_shape: tuple,
    patch_size: int,
    twoD: bool,
) -> jnp.ndarray:
    """[B, L, p^ndim * C] tokens -> [B, C, *spatial] image.

    image_shape is the full target shape (B, C, *spatial) — shape-only
    equivalent of the reference passing the original data tensor.
    """
    p = patch_size
    if twoD:
        b, c, h, w = image_shape
        nh, nw = h // p, w // p
        x = tokens.reshape(b, nh, nw, p, p, c)
        # nhwpqc -> nchpwq
        x = x.transpose(0, 5, 1, 3, 2, 4)
        return x.reshape(b, c, nh * p, nw * p)
    else:
        b, c, h, w, d = image_shape
        nh, nw, nd = h // p, w // p, d // p
        x = tokens.reshape(b, nh, nw, nd, p, p, p, c)
        # nhwdpqrc -> nchpwqdr
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, nh * p, nw * p, nd * p)
