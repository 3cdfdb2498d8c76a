"""UNETR convolutional decoder blocks (2D + 3D), channels-last.

JAX reimplementation of the MONAI block semantics the reference imports
(`src/UCF_VIT/simple/arch.py:33-34`: UnetrBasicBlock, UnetrPrUpBlock,
UnetrUpBlock, UnetOutBlock) plus the reference's own `MyUnetBlock`
(`simple/building_blocks.py:241-285`). Semantics matched to MONAI:
instance norm (no affine), LeakyReLU(0.01), residual blocks with 1x1
downsample when channels/stride change, transposed-conv upsampling with
kernel == stride (exact x2 upsample).

TPU-native notes: everything here is channels-last (NHWC / NHWDC) — the
layout XLA's TPU conv emitter prefers; the models transpose once at the
API boundary (reference keeps NCHW throughout, a CUDA convention).
Alignment-corner linear resize is expressed as per-axis constant
interpolation matrices contracted with dot_general — matmuls on the MXU
instead of gather ops.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ucf_vit_tpu.models.blocks import trunc_normal_init, zeros_init

CONV_AXES2 = (None, None, None, "embed")
CONV_AXES3 = (None, None, None, None, "embed")


def _conv_axes(ndim: int):
    return (None,) * (ndim + 1) + ("embed",)


def conv(features: int, kernel: int, stride: int, ndim: int, *, bias: bool = True,
         name: Optional[str] = None) -> nn.Conv:
    """Conv with 'same'-style MONAI padding ((k - 1) // 2 each side)."""
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel,) * ndim,
        strides=(stride,) * ndim,
        padding=[(pad, pad)] * ndim,
        use_bias=bias,
        kernel_init=nn.with_partitioning(trunc_normal_init, _conv_axes(ndim)),
        bias_init=nn.with_partitioning(zeros_init, ("embed",)),
        name=name,
    )


def transp_conv(features: int, up: int, ndim: int, *, bias: bool = True,
                name: Optional[str] = None) -> nn.ConvTranspose:
    """Transposed conv with kernel == stride == up: exact up-x upsampling."""
    return nn.ConvTranspose(
        features,
        kernel_size=(up,) * ndim,
        strides=(up,) * ndim,
        padding="VALID",
        use_bias=bias,
        kernel_init=nn.with_partitioning(trunc_normal_init, _conv_axes(ndim)),
        bias_init=nn.with_partitioning(zeros_init, ("embed",)),
        name=name,
    )


class InstanceNorm(nn.Module):
    """Instance norm over spatial dims, no affine (MONAI "instance" default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, *spatial, C]; normalize each (sample, channel) over spatial.
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))


def lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.01)


class UnetResBlock(nn.Module):
    """conv-norm-lrelu-conv-norm + (1x1 conv-norm residual) -> lrelu.

    MONAI UnetResBlock semantics (used with norm_name="instance",
    res_block=True everywhere in the reference, `simple/arch.py:808-947`).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        y = conv(self.out_channels, self.kernel_size, self.stride, self.ndim,
                 name="conv1")(x)
        y = InstanceNorm(name="norm1")(y)
        y = lrelu(y)
        y = conv(self.out_channels, self.kernel_size, 1, self.ndim, name="conv2")(y)
        y = InstanceNorm(name="norm2")(y)
        if in_channels != self.out_channels or self.stride != 1:
            res = conv(self.out_channels, 1, self.stride, self.ndim, name="conv3")(x)
            res = InstanceNorm(name="norm3")(res)
        else:
            res = x
        return lrelu(y + res)


class UnetrBasicBlock(nn.Module):
    """MONAI UnetrBasicBlock(res_block=True) == one UnetResBlock."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return UnetResBlock(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            ndim=self.ndim,
            name="layer",
        )(x)


class UnetrPrUpBlock(nn.Module):
    """Projection-upsample chain: init transp-conv then num_layer x
    (transp-conv -> UnetResBlock). MONAI UnetrPrUpBlock with
    conv_block=True, res_block=True (`simple/arch.py:818-857`)."""

    out_channels: int
    num_layer: int
    kernel_size: int = 3
    upsample: int = 2
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = transp_conv(self.out_channels, self.upsample, self.ndim,
                        name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = transp_conv(self.out_channels, self.upsample, self.ndim,
                            name=f"up_{i}")(x)
            x = UnetResBlock(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                stride=1,
                ndim=self.ndim,
                name=f"res_{i}",
            )(x)
        return x


class UnetrUpBlock(nn.Module):
    """Upsample + concat skip + UnetResBlock. MONAI UnetrUpBlock
    (res_block=True) (`simple/arch.py:858-905`)."""

    out_channels: int
    kernel_size: int = 3
    upsample: int = 2
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = transp_conv(self.out_channels, self.upsample, self.ndim,
                        name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetResBlock(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=1,
            ndim=self.ndim,
            name="conv_block",
        )(x)


class MyUnetBlock(nn.Module):
    """Bare transposed-conv upsample (no skip). Parity: reference
    `simple/building_blocks.py:241-285`."""

    out_channels: int
    upsample: int = 2
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return transp_conv(self.out_channels, self.upsample, self.ndim,
                           name="transp_conv")(x)


class UnetOutBlock(nn.Module):
    """1x1 conv to class logits. MONAI UnetOutBlock."""

    num_classes: int
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv(self.num_classes, 1, 1, self.ndim, name="conv")(x)


# ----------------------------------------------------------------------------
# align_corners=True linear resize (torch nn.Upsample(mode='*linear',
# align_corners=True) equivalence) as static interpolation matmuls.
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_len: int, out_len: int) -> np.ndarray:
    """[out_len, in_len] linear interpolation matrix, align_corners=True."""
    m = np.zeros((out_len, in_len), dtype=np.float32)
    if out_len == 1 or in_len == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(out_len) * (in_len - 1) / (out_len - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = coords - lo
    m[np.arange(out_len), lo] += 1.0 - frac
    m[np.arange(out_len), hi] += frac
    return m


def resize_linear_align_corners(
    x: jnp.ndarray, out_spatial: Sequence[int]
) -> jnp.ndarray:
    """Bi/tri-linear resize with align_corners=True over channels-last input.

    x: [B, *spatial, C] -> [B, *out_spatial, C]. Each axis is resampled by a
    constant [out, in] matrix via dot_general (MXU work, no gathers).
    """
    out_spatial = tuple(out_spatial)
    nd = len(out_spatial)
    assert x.ndim == nd + 2
    for axis, out_len in enumerate(out_spatial, start=1):
        in_len = x.shape[axis]
        if in_len == out_len:
            continue
        w = jnp.asarray(_interp_matrix(in_len, out_len))  # [out, in]
        x = jnp.moveaxis(
            jnp.tensordot(w, x, axes=((1,), (axis,))), 0, axis
        )
    return x
