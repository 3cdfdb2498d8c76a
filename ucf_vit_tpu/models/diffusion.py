"""DiffusionVIT: ViT denoiser for DDPM training.

Capability parity with reference `src/UCF_VIT/simple/arch.py:1115-1283`
(`fsdp/arch.py:1160-1345`): sinusoidal time-step embedding table ->
2-layer MLP (relu + dropout 0.5) added to every token after the positional
embedding, transformer encoder, then a transformer (or linear) decoder
predicting the noise in patch space.

Fixes reference quirk #3 (SURVEY.md): `_pos_embed(x)` is called with
seq_ps=None intent; we pass seq_ps through explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ucf_vit_tpu.models.blocks import Block, EmbeddingDenseLayer, layer_norm, pdense
from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.ops.pos_embed import (
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    sinusoidal_time_embedding_table,
)


class DiffusionVIT(VIT):
    """Use class_token=False (reference `train_diffusion_fsdp.py:268`)."""

    linear_decoder: bool = False
    decoder_depth: int = 8
    decoder_embed_dim: int = 512
    decoder_num_heads: int = 16
    mlp_ratio_decoder: float = 4.0
    time_steps: int = 1000

    def _setup_head(self):
        self.head = None  # reference: `simple/arch.py:1126`

    def _decoder_sincos_init(self):
        if self.adaptive_patching and not self.sqrt_len_method:
            def init(key, shape, dtype=jnp.float32):
                import jax

                return 0.02 * jax.random.normal(key, shape, dtype)
            return init
        g = self.grid_size
        if self.twoD:
            table = get_2d_sincos_pos_embed(self.decoder_embed_dim, g[0], g[1])
        else:
            table = get_3d_sincos_pos_embed(self.decoder_embed_dim, g[0], g[1], g[2])

        def init(key, shape, dtype=jnp.float32):
            del key
            return jnp.asarray(table[None], dtype).reshape(shape)

        return init

    def setup(self):
        assert not self.class_token, "DiffusionVIT runs with class_token=False"
        super().setup()

        # Constant sinusoidal table [T, D]; a lookup, not a parameter
        # (parity: SinusoidalEmbeddings registers a buffer, `pos_embed.py:16-28`).
        self._time_table = jnp.asarray(
            sinusoidal_time_embedding_table(self.time_steps, self.embed_dim),
            jnp.float32,
        )
        self.time_embedding_map = EmbeddingDenseLayer(
            c_out=self.embed_dim, dropout_prob=0.5, name="time_embedding_map"
        )

        pred_in_axis = "embed" if self.linear_decoder else "dec_embed"
        self.decoder_pred = pdense(
            self.patch_dim, kernel_axes=(pred_in_axis, None), name="decoder_pred"
        )
        if not self.linear_decoder:
            self.decoder_embed = pdense(
                self.decoder_embed_dim,
                kernel_axes=("embed", "dec_embed"),
                name="decoder_embed",
            )
            self.decoder_norm = layer_norm(name="decoder_norm")
            self.decoder_pos_embed = self.param(
                "decoder_pos_embed",
                nn.with_partitioning(self._decoder_sincos_init(), (None, None, "embed")),
                (1, self.num_patches, self.decoder_embed_dim),
            )
            dpr = np.linspace(0.0, self.drop_path_rate, self.decoder_depth)
            block_cls = Block
            if self.remat:
                block_cls = nn.remat(Block, static_argnums=(2,))  # 2: flax core fn is (module, x, deterministic)
            dec_kwargs = dict(
                dim=self.decoder_embed_dim,
                num_heads=self.decoder_num_heads,
                attn_impl=self.attn_impl,
                sp_mode=self.sp_mode,
                mlp_ratio=self.mlp_ratio_decoder,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                init_values=self.init_values,
                proj_drop=self.proj_drop_rate,
                attn_drop=self.attn_drop_rate,
                dtype=self.dtype,
                gelu_approx=self.gelu_approx,
            )
            if self.pipe_par_size > 1:
                # same stacked-under-pp-only layout as the MAE decoder
                # (models/mae.py): stages hold their slice, non-pp
                # checkpoints keep per-layer names
                from ucf_vit_tpu.models.vit import _ScanBlockBody

                assert self.decoder_depth % self.pipe_par_size == 0, (
                    f"decoder_depth {self.decoder_depth} not divisible by "
                    f"pipe_par_size {self.pipe_par_size}"
                )
                self._pipe_dec_kwargs = dict(dec_kwargs)
                self.decoder_blocks_scan = nn.scan(
                    _ScanBlockBody,
                    length=self.decoder_depth,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast,),
                    metadata_params={nn.PARTITION_NAME: "layers"},
                )(
                    block_cls=block_cls,
                    block_kwargs=dec_kwargs,
                    name="decoder_blocks",
                )
                self.decoder_blocks = None
            else:
                self.decoder_blocks = [
                    block_cls(
                        drop_path=float(dpr[i]),
                        name=f"decoder_blocks_{i}",
                        **dec_kwargs,
                    )
                    for i in range(self.decoder_depth)
                ]

    # --------------------------------------------------------------- forward

    def forward_features(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        var_ids=None,
        seq_ps=None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Parity: `simple/arch.py:1227-1267` with the time embedding added
        after the positional embedding."""
        x = self.embed_tokens(x, var_ids, deterministic)
        x = self.apply_pos_embed(x, seq_ps, deterministic)
        x = self.patch_drop(x, deterministic)  # reference order: `:1262`
        time_emb = self._time_table[t]  # [B, D]
        time_emb = self.time_embedding_map(
            time_emb.astype(x.dtype), deterministic=deterministic
        )[:, None, :]
        x = x + time_emb
        x = self.run_blocks(x, deterministic)
        return self.norm(x)

    def forward_head(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.pool(x)
        if not self.linear_decoder:
            x = self.decoder_embed(x)
            x = x + self.decoder_pos_embed
            if self.pipe_par_size > 1:
                if self.is_initializing():
                    x, _ = self.decoder_blocks_scan(x, deterministic)
                else:
                    from ucf_vit_tpu.models.vit import run_pipelined_stack

                    x, _, _ = run_pipelined_stack(
                        self.decoder_blocks_scan,
                        self._pipe_dec_kwargs,
                        self.pipe_par_size,
                        self.pipe_microbatches,
                        x,
                    )
            else:
                for blk in self.decoder_blocks:
                    x = blk(x, deterministic)
            x = self.decoder_norm(x)
        return self.decoder_pred(x)

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        var_ids=None,
        seq_ps=None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, C, *spatial] noised image; t: [B] int time steps.
        Returns [B, L, patch_dim] predicted noise tokens."""
        x = self.forward_features(x, t, var_ids, seq_ps, deterministic)
        return self.forward_head(x, deterministic)
