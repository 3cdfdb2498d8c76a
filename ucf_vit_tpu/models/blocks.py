"""ViT building blocks (Flax linen), with GSPMD logical-axis annotations.

Capability parity with both reference block libraries at once
(`src/UCF_VIT/simple/building_blocks.py` and `fsdp/building_blocks.py`):
there is ONE implementation here, and tensor/fsdp parallelism is expressed as
partitioning metadata on the weights instead of a duplicated code tree. The
Megatron column/row sharding of the reference fsdp blocks
(`fsdp/building_blocks.py:98-219`: fc1 column-, fc2 row-sharded; qkv column-,
proj row-sharded) maps to the logical axes below + the LOGICAL_RULES table in
`ucf_vit_tpu/parallel/mesh.py`; XLA inserts the forward all-reduce /
backward identity collectives that the reference hand-wrote as
autograd.Functions (`utils/dist_functions.py`).

Logical weight axes:
    "embed"  — model dim on weights  -> sharded on the fsdp axis (ZeRO-3 style)
    "qkv"    — fused qkv output dim  -> sharded on the tp axis (column parallel)
    "mlp"    — MLP hidden dim        -> sharded on the tp axis (column parallel)
    "tp_in"  — row-parallel input dim-> sharded on the tp axis (row parallel)
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ucf_vit_tpu.parallel.mesh import logical_constraint

from ucf_vit_tpu.ops.attention import AttnImpl, multi_head_attention

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
zeros_init = nn.initializers.zeros


def pdense(
    features: int,
    *,
    use_bias: bool = True,
    kernel_axes: Tuple[Optional[str], Optional[str]],
    kernel_init: Callable = trunc_normal_init,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
) -> nn.Dense:
    """Dense layer with partitioning metadata on kernel and bias."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=nn.with_partitioning(kernel_init, kernel_axes),
        bias_init=nn.with_partitioning(zeros_init, (kernel_axes[1],)),
        dtype=dtype,
        name=name,
    )


def layer_norm(name: Optional[str] = None, dtype: Optional[Dtype] = None) -> nn.LayerNorm:
    return nn.LayerNorm(
        epsilon=1e-6,
        scale_init=nn.with_partitioning(nn.initializers.ones, ("embed",)),
        bias_init=nn.with_partitioning(zeros_init, ("embed",)),
        dtype=dtype,
        name=name,
    )


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class LayerScale(nn.Module):
    dim: int
    init_values: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma",
            nn.with_partitioning(
                nn.initializers.constant(self.init_values), ("embed",)
            ),
            (self.dim,),
        )
        return x * gamma


class PatchEmbed(nn.Module):
    """2D/3D image -> patch token embedding via conv (stride = patch size).

    Parity: reference `simple/building_blocks.py:30-92`. Input is channels-
    first ([B, C, H, W] or [B, C, H, W, D]) for API parity with the reference
    data layout; internally transposed to channels-last, the layout XLA
    prefers for TPU convolutions.
    """

    patch_size: int
    embed_dim: int
    twoD: bool = True
    use_norm: bool = False
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        if self.twoD:
            x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
            kernel = (p, p)
        else:
            x = x.transpose(0, 2, 3, 4, 1)  # NCHWD -> NHWDC
            kernel = (p, p, p)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=kernel,
            strides=kernel,
            use_bias=self.bias,
            kernel_init=nn.with_partitioning(
                trunc_normal_init, (None,) * (len(kernel) + 1) + ("embed",)
            ),
            bias_init=nn.with_partitioning(zeros_init, ("embed",)),
            dtype=self.dtype,
            name="proj",
        )(x)
        x = x.reshape(x.shape[0], -1, self.embed_dim)  # [B, L, D]; h-major order
        if self.use_norm:
            x = layer_norm(name="norm")(x)
        return x


class Mlp(nn.Module):
    """Transformer MLP. Parity: reference `simple/building_blocks.py:94-129`;
    TP sharding parity: `fsdp/building_blocks.py:98-144` (fc1 column / fc2 row)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    gelu_approx: bool = True  # tanh approx (VPU cost); False = exact erf
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = pdense(
            self.hidden_features, kernel_axes=("embed", "mlp"), dtype=self.dtype,
            name="fc1",
        )(x)
        # tanh-approx gelu by default: ~40% cheaper on the VPU than exact
        # erf; the reference uses torch nn.GELU (exact). gelu_approx=False
        # restores exact erf for bit-parity testing.
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = pdense(
            self.out_features, kernel_axes=("mlp", "embed"), dtype=self.dtype,
            name="fc2",
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with impl dispatch.

    Parity: reference `simple/building_blocks.py:131-192`; TP sharding parity:
    `fsdp/building_blocks.py:146-219` (qkv column / proj row; heads split over
    tp).
    """

    dim: int
    num_heads: int
    attn_impl: AttnImpl = AttnImpl.AUTO
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # block-diagonal segment masking for sequence-packed batches (MAE
    # seq_pack): tokens attend only within their seg_len-sized segment
    seg_len: Optional[int] = None
    # sequence-parallel attention strategy under sp > 1 (rides the model
    # like attn_impl — no process-global state; ops/attention.py SP_MODES)
    sp_mode: str = "auto"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, n, c = x.shape
        assert c == self.dim
        head_dim = self.dim // self.num_heads

        qkv = pdense(
            3 * self.dim, use_bias=self.qkv_bias, kernel_axes=("embed", "qkv"),
            dtype=self.dtype, name="qkv",
        )(x)
        # split on the last (contiguous) dim: cheaper than strided slicing of
        # a [B, N, 3, H, dh] view
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="k_norm")(k)

        # [B, H, N, dh]; heads dim sharded over tp under GSPMD.
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q = logical_constraint(q, ("batch", "heads", "seq", None))
        k = logical_constraint(k, ("batch", "heads", "seq", None))
        v = logical_constraint(v, ("batch", "heads", "seq", None))

        # Attention-probability dropout (reference `attn_drop`, threaded into
        # every attention branch at `simple/building_blocks.py:163-187`).
        # Runs inside the Pallas flash kernel at any sequence length (hash
        # mask regenerated by the backward, ops/attn_dropout.py) and on the
        # EINSUM path; an explicit XLA request with dropout hard-errors.
        drop_rate = 0.0 if deterministic else self.attn_drop
        drop_rng = self.make_rng("dropout") if drop_rate > 0.0 else None
        out = multi_head_attention(
            q, k, v, impl=self.attn_impl, sm_scale=head_dim**-0.5,
            seg_len=self.seg_len, dropout_rate=drop_rate, dropout_rng=drop_rng,
            sp_mode=self.sp_mode,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)

        out = pdense(
            self.dim, kernel_axes=("tp_in", "embed"), dtype=self.dtype, name="proj"
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm transformer block. Parity: `simple/building_blocks.py:194-239`."""

    dim: int
    num_heads: int
    attn_impl: AttnImpl = AttnImpl.AUTO
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    gelu_approx: bool = True
    seg_len: Optional[int] = None  # sequence-packing segment mask (see Attention)
    sp_mode: str = "auto"  # sequence-parallel strategy (see Attention)
    # MoE (capability-plus, models/moe.py): > 1 replaces the dense MLP with
    # a top-k routed expert mixture sharded over the 'ep' mesh axis
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = layer_norm(name="norm1", dtype=self.dtype)(x)
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            seg_len=self.seg_len,
            sp_mode=self.sp_mode,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(self.dim, self.init_values, name="ls1")(y)
        y = DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = x + y

        y = layer_norm(name="norm2", dtype=self.dtype)(x)
        if self.moe_num_experts > 1:
            from ucf_vit_tpu.models.moe import MoeMlp

            y = MoeMlp(
                dim=self.dim,
                hidden_features=int(self.dim * self.mlp_ratio),
                num_experts=self.moe_num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                gelu_approx=self.gelu_approx,
                dtype=self.dtype,
                name="moe_mlp",
            )(y, deterministic)
        else:
            y = Mlp(
                hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim,
                drop=self.proj_drop,
                gelu_approx=self.gelu_approx,
                dtype=self.dtype,
                name="mlp",
            )(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(self.dim, self.init_values, name="ls2")(y)
        y = DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        x = x + y
        x = logical_constraint(x, ("batch", "seq", None))
        return x


class LinearTokenEmbed(nn.Module):
    """LayerNorm -> Linear -> LayerNorm token embed for adaptively pre-patched
    input. Parity: reference `simple/arch.py:282-289`."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-6, name="norm_in")(x)
        x = pdense(self.embed_dim, kernel_axes=(None, "embed"), name="proj")(x)
        x = layer_norm(name="norm_out")(x)
        return x


class AdaptivePosMLP(nn.Module):
    """Learned positional embedding from (size, center...) descriptors of
    adaptive patches: Linear(3|4 -> D) + GELU. Parity: `simple/arch.py:311-321`."""

    embed_dim: int

    @nn.compact
    def __call__(self, seq_ps: jnp.ndarray) -> jnp.ndarray:
        h = pdense(self.embed_dim, kernel_axes=(None, "embed"), name="linear")(seq_ps)
        return nn.gelu(h, approximate=False)


class EmbeddingDenseLayer(nn.Module):
    """Diffusion time-embedding MLP. Parity: `simple/building_blocks.py:286-299`."""

    c_out: int
    dropout_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = pdense(self.c_out, kernel_axes=(None, "embed"), name="linear1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_prob)(x, deterministic=deterministic)
        x = pdense(self.c_out, kernel_axes=("embed", "embed_out"), name="linear2")(x)
        return x


class VariableMappingAttention(nn.Module):
    """1-query cross-attention used for variable aggregation.

    Parity: reference `simple/building_blocks.py:301-373` (separate q and
    fused kv projections); TP parity: `fsdp/building_blocks.py:334-419`.
    """

    dim: int
    num_heads: int
    attn_impl: AttnImpl = AttnImpl.AUTO
    qkv_bias: bool = False
    proj_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, var_query: jnp.ndarray, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        # var_query: [B', Na, D]; x: [B', Ni, D] where B' = batch * seq.
        bq, n_a, c = var_query.shape
        _, n_i, _ = x.shape
        head_dim = self.dim // self.num_heads

        q = pdense(
            self.dim, use_bias=self.qkv_bias, kernel_axes=("embed", "qkv"),
            dtype=self.dtype, name="q",
        )(var_query)
        kv = pdense(
            2 * self.dim, use_bias=self.qkv_bias, kernel_axes=("embed", "qkv"),
            dtype=self.dtype, name="kv",
        )(x)

        q = q.reshape(bq, n_a, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        kv = kv.reshape(bq, n_i, 2, self.num_heads, head_dim)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)

        # Tiny sequence lengths (Na=1, Ni=#channels): einsum is the fast path;
        # a flash kernel would waste a full 128-lane tile per variable.
        out = multi_head_attention(
            q, k, v, impl=AttnImpl.EINSUM, sm_scale=head_dim**-0.5
        )
        out = out.transpose(0, 2, 1, 3).reshape(bq, n_a, c)
        out = pdense(
            self.dim, use_bias=self.proj_bias, kernel_axes=("tp_in", "embed"),
            dtype=self.dtype, name="proj",
        )(out)
        return out
