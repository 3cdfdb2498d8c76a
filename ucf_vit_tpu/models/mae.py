"""MAE: masked-autoencoder pretraining head on the shared ViT encoder.

Capability parity with reference `src/UCF_VIT/simple/arch.py:538-755` (and the
TP flavor `fsdp/arch.py:550-793` — one module here; parallelism comes from
mesh sharding). Features: random token masking (mask_ratio), transformer
decoder (or linear decoder), mask tokens un-shuffled via ids_restore, sincos
or adaptive-MLP decoder positional embedding.

TPU-native notes:
- Masking keeps a *static* len_keep = int(L * (1 - mask_ratio)) so all shapes
  are known at trace time — the encoder runs on the shortened sequence, which
  is the entire FLOP saving of MAE, with zero dynamic shapes.
- Masking noise comes from a JAX PRNG key; under a mesh every device derives
  the same key, so the TP-consistent-noise broadcast the reference hand-rolls
  (`fsdp/arch.py:682-687`) is unnecessary by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ucf_vit_tpu.models.blocks import AdaptivePosMLP, Block, layer_norm, pdense, zeros_init
from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.ops.pos_embed import get_2d_sincos_pos_embed, get_3d_sincos_pos_embed


class MAE(VIT):
    """Masked autoencoder. Use class_token=False (reference scripts always do:
    `train_masked_fsdp.py:299`)."""

    mask_ratio: float = 0.75
    linear_decoder: bool = False
    decoder_depth: int = 8
    decoder_embed_dim: int = 512
    decoder_num_heads: int = 16
    mlp_ratio_decoder: float = 4.0
    # Sequence packing: fold seq_pack samples' kept tokens into one encoder
    # sequence with block-diagonal attention (seg_len = len_keep). With
    # drop_path == 0 (all shipped configs) numerics are identical to unpacked
    # attention (cross-sample scores are masked); with drop_path > 0 DropPath
    # draws one mask per packed row, which would share one stochastic-depth
    # decision across the packed samples — setup() rejects that combination.
    # Throughput rises because a 75%-masked encoder runs tiny sequences
    # (e.g. 64 of 256 tokens) that under-fill the chip. Pure capability-plus:
    # the reference runs the short sequences as-is.
    seq_pack: int = 1

    @property
    def len_keep(self) -> int:
        return int(self.num_patches * (1 - self.mask_ratio))

    def _block_seg_len(self):
        return self.len_keep if self.seq_pack > 1 else None

    def _decoder_sincos_init(self):
        if self.adaptive_patching and not self.sqrt_len_method:
            def init(key, shape, dtype=jnp.float32):
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
        assert not self.class_token, "MAE runs with class_token=False"
        assert self.num_classes is None, "MAE has no classification head"
        if self.seq_pack > 1:
            from ucf_vit_tpu.ops.attention import SHORT_SEQ_THRESHOLD

            assert self.drop_path_rate == 0.0, (
                "seq_pack > 1 with drop_path > 0 would share one DropPath "
                "decision across all samples packed into a row (the mask is "
                "drawn per packed row) — a silent training-distribution "
                "change. Use seq_pack=1 or drop_path_rate=0."
            )
            packed = self.seq_pack * self.len_keep
            assert packed <= SHORT_SEQ_THRESHOLD, (
                f"seq_pack {self.seq_pack} x len_keep {self.len_keep} = "
                f"{packed} tokens exceeds the segment-masked attention limit "
                f"({SHORT_SEQ_THRESHOLD}); packing only pays when the kept "
                f"sequence is short — lower seq_pack"
            )
            assert self.patch_drop_rate == 0.0, (
                "seq_pack > 1 with patch_drop_rate > 0 is unsupported: "
                "patch_drop shrinks each sample's kept tokens below len_keep "
                "while the block-diagonal segment mask still partitions the "
                "packed sequence at len_keep boundaries, so tokens from "
                "different samples would silently attend to each other. Use "
                "seq_pack=1 or patch_drop_rate=0 (mask_ratio already "
                "subsamples the sequence in MAE)."
            )
        super().setup()

        mask_dim = self.embed_dim if self.linear_decoder else self.decoder_embed_dim
        self.mask_token = self.param(
            "mask_token",
            nn.with_partitioning(zeros_init, (None, None, "embed")),
            (1, 1, mask_dim),
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
            if self.use_adaptive_pos_emb:
                self.decoder_adaptive_pos_dep_emb = AdaptivePosMLP(
                    self.decoder_embed_dim, name="decoder_adaptive_pos_dep_emb"
                )
            else:
                self.decoder_pos_embed = self.param(
                    "decoder_pos_embed",
                    nn.with_partitioning(
                        self._decoder_sincos_init(), (None, None, "embed")
                    ),
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
                # pipeline the decoder stack too — otherwise every pp stage
                # would recompute it redundantly. Stacked-params layout only
                # under pp so non-pp checkpoints keep the per-layer names.
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

    # ------------------------------------------------------------------ mask

    def random_masking(
        self, x: jnp.ndarray, noise: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Shuffle-based random masking. Parity: `simple/arch.py:663-682`.

        Returns (kept tokens [B, len_keep, D], mask [B, L] with 1 = masked,
        ids_restore [B, L]).
        """
        b, l, d = x.shape
        len_keep = self.len_keep
        if noise is None:
            noise = jax.random.uniform(self.make_rng("mask"), (b, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((b, l), x.dtype).at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    # --------------------------------------------------------------- decoder

    def mask_head(
        self,
        x: jnp.ndarray,
        ids_restore: jnp.ndarray,
        seq_ps: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Un-shuffle mask tokens + decode. Parity: `simple/arch.py:684-712`."""
        if not self.linear_decoder:
            x = self.decoder_embed(x)
        b, n_keep, d = x.shape
        n_masked = ids_restore.shape[1] - n_keep
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (b, n_masked, d)
        )
        x = jnp.concatenate([x, mask_tokens], axis=1)
        x = jnp.take_along_axis(x, ids_restore[:, :, None], axis=1)

        if self.linear_decoder:
            return self.decoder_pred(x)

        if self.use_adaptive_pos_emb:
            assert seq_ps is not None
            pos = self.decoder_adaptive_pos_dep_emb(seq_ps)
        else:
            pos = self.decoder_pos_embed
        x = x + pos
        if self.pipe_par_size > 1:
            if self.is_initializing():
                x, _ = self.decoder_blocks_scan(x, deterministic)
            else:
                x = self._run_decoder_pipelined(x)
        else:
            for blk in self.decoder_blocks:
                x = blk(x, deterministic)
        x = self.decoder_norm(x)
        return self.decoder_pred(x)

    def _run_decoder_pipelined(self, x: jnp.ndarray) -> jnp.ndarray:
        """GPipe over the decoder stack — same machinery as the encoder."""
        from ucf_vit_tpu.models.vit import run_pipelined_stack

        y, _, _ = run_pipelined_stack(
            self.decoder_blocks_scan,
            self._pipe_dec_kwargs,
            self.pipe_par_size,
            self.pipe_microbatches,
            x,
        )
        return y

    # --------------------------------------------------------------- forward

    def forward_features(
        self,
        x: jnp.ndarray,
        var_ids=None,
        seq_ps=None,
        deterministic: bool = True,
        mask_noise: Optional[jnp.ndarray] = None,
    ):
        x = self.embed_tokens(x, var_ids, deterministic)
        x = self.apply_pos_embed(x, seq_ps, deterministic)
        x, mask, ids_restore = self.random_masking(x, mask_noise)
        # Parity: the reference applies PatchDropout after masking
        # (`simple/arch.py:742`); as there, patch_drop > 0 permutes the kept
        # set so the decoder's ids_restore unshuffle no longer maps tokens to
        # their true positions — usable only as a regularizer, and no shipped
        # config enables it.
        x = self.patch_drop(x, deterministic)
        if self.seq_pack > 1:
            b, n, d = x.shape
            assert b % self.seq_pack == 0, (
                f"batch {b} not divisible by seq_pack {self.seq_pack}"
            )
            x = x.reshape(b // self.seq_pack, self.seq_pack * n, d)
        x = self.run_blocks(x, deterministic)
        if self.seq_pack > 1:
            x = x.reshape(b, n, d)
        return self.norm(x), mask, ids_restore

    def __call__(
        self,
        x: jnp.ndarray,
        var_ids=None,
        seq_ps=None,
        deterministic: bool = True,
        mask_noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (pred [B, L, patch_dim], mask [B, L] — 1 where masked)."""
        x, mask, ids_restore = self.forward_features(
            x, var_ids, seq_ps, deterministic, mask_noise
        )
        pred = self.mask_head(x, ids_restore, seq_ps, deterministic)
        return pred, mask
