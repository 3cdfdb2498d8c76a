"""UNETR: ViT encoder + UNet-style conv decoder for 2D/3D segmentation.

Capability parity with reference `src/UCF_VIT/simple/arch.py:757-1113`
(`fsdp/arch.py:794-1159`): skip-connection mode (4 transformer intermediates
fed through conv encoders into a U-Net decoder chain), no-skip mode
(MyUnetBlock upsample chain), linear-decoder mode, and the adaptive
sqrt-len path (token sequence reassembled into a square/cube image by the
caller, conv patch-embedded — `train_unetr_simple.py:43-54`).

Layout: decoder runs channels-last internally (TPU conv layout); the public
API takes/returns channels-first for parity with the reference data layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ucf_vit_tpu.models.unet_blocks import (
    MyUnetBlock,
    UnetOutBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
    resize_linear_align_corners,
)
from ucf_vit_tpu.models.blocks import pdense
from ucf_vit_tpu.models.vit import VIT
from ucf_vit_tpu.parallel.mesh import logical_constraint


def _spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain a channels-last feature map [B, s1, ..., C] to the decoder
    layout: batch over the data axes, FIRST spatial dim over sp.

    This is what makes `parallelism.seq_par_size > 1` mean *spatial
    partitioning* for the conv decoder (capability-plus — the reference
    asserts seq_par_size == 1, `train_masked_fsdp.py:220`): GSPMD inserts
    the halo exchanges each 3x3(x3) conv needs at shard edges and keeps
    every full-resolution activation (the UNETR memory/bandwidth ceiling,
    BASELINE.md r4) at 1/sp per chip. Levels whose s1 does not divide sp
    stay replicated (logical_constraint drops non-dividing dims)."""
    names = ("batch", "spatial") + (None,) * (x.ndim - 2)
    return logical_constraint(x, names)


class UNETR(VIT):
    """Use class_token=False (reference scripts always do,
    `train_unetr_simple.py:267`)."""

    linear_decoder: bool = False
    feature_size: int = 16
    skip_connection: bool = True

    @property
    def ndim(self) -> int:
        return 2 if self.twoD else 3

    @property
    def feat_size(self) -> Tuple[int, ...]:
        """Token-grid side lengths. Parity: `simple/arch.py:768-791`."""
        if self.adaptive_patching:
            return (self.sqrt_len,) * self.ndim
        return self.grid_size

    @property
    def skip_indices(self):
        inc = self.depth // 4
        return [(i + 1) * inc for i in range(3)]

    def _setup_head(self):
        self.head = None  # reference: `simple/arch.py:766`

    def setup(self):
        assert not self.class_token, "UNETR runs with class_token=False"
        assert self.patch_drop_rate == 0.0, (
            "UNETR consumes the full spatial token grid (intermediates are "
            "reshaped to the grid), so patch_drop_rate > 0 would crash with "
            "a bare reshape error at train time — set patch_drop_rate: 0 "
            "(the reference shares this constraint, simple/arch.py:1059)"
        )
        if self.adaptive_patching:
            assert self.sqrt_len_method, (
                "adaptive UNETR uses the sqrt-len method (reference "
                "train_unetr_simple.py:138 forces sqrt_len_method=True)"
            )
        super().setup()

        nd = self.ndim
        fs = self.feature_size
        if self.linear_decoder:
            self.mlp_head = pdense(
                self.num_classes, kernel_axes=("embed", None), name="mlp_head"
            )
            return

        # trainer.remat also checkpoints the conv decoder: its full-resolution
        # 3D activations, not the transformer's, are what OOM first (the
        # shipped 64^3 config hits 16 GiB at bs>=4 with blocks-only remat);
        # every block call here is tensor-only, so nn.remat applies directly.
        basic_cls, prup_cls, up_cls, my_cls = (
            (nn.remat(UnetrBasicBlock), nn.remat(UnetrPrUpBlock),
             nn.remat(UnetrUpBlock), nn.remat(MyUnetBlock))
            if self.remat
            else (UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock, MyUnetBlock)
        )
        if self.skip_connection:
            self.encoder1 = basic_cls(
                out_channels=fs, kernel_size=3, stride=1, ndim=nd, name="encoder1"
            )
            self.encoder2 = prup_cls(
                out_channels=fs * 2, num_layer=2, ndim=nd, name="encoder2"
            )
            self.encoder3 = prup_cls(
                out_channels=fs * 4, num_layer=1, ndim=nd, name="encoder3"
            )
            self.encoder4 = prup_cls(
                out_channels=fs * 8, num_layer=0, ndim=nd, name="encoder4"
            )
            self.decoder5 = up_cls(out_channels=fs * 8, ndim=nd, name="decoder5")
            self.decoder4 = up_cls(out_channels=fs * 4, ndim=nd, name="decoder4")
            self.decoder3 = up_cls(out_channels=fs * 2, ndim=nd, name="decoder3")
            last_up = 2 if self.feat_size[0] * 16 == self.spatial_size[0] else 1
            self.decoder2 = up_cls(
                out_channels=fs, upsample=last_up, ndim=nd, name="decoder2"
            )
        else:
            self.decoder5 = my_cls(out_channels=fs * 8, ndim=nd, name="decoder5")
            self.decoder4 = my_cls(out_channels=fs * 4, ndim=nd, name="decoder4")
            self.decoder3 = my_cls(out_channels=fs * 2, ndim=nd, name="decoder3")
            self.decoder2 = my_cls(out_channels=fs, ndim=nd, name="decoder2")
        self.out = UnetOutBlock(num_classes=self.num_classes, ndim=nd, name="out")

    # ----------------------------------------------------------------- heads

    def proj_feat(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, L, D] tokens -> [B, *feat_size, D] channels-last feature map.
        Parity: `simple/arch.py:949-956` (which permutes to channels-first —
        we stay channels-last for TPU convs)."""
        b = x.shape[0]
        return x.reshape((b,) + self.feat_size + (self.embed_dim,))

    def unetr_head(self, x, intermediates, enc1, deterministic: bool = True):
        """Parity: `simple/arch.py:958-993`. All channels-last."""
        if self.linear_decoder:
            x = self.mlp_head(x)  # [B, L, classes]
            b = x.shape[0]
            x = x.reshape((b,) + self.grid_size + (self.num_classes,))
            return resize_linear_align_corners(
                x, tuple(s * self.patch_size for s in self.grid_size)
            )

        if not self.skip_connection:
            x = _spatial(self.proj_feat(x))
            x = _spatial(self.decoder5(x))
            x = _spatial(self.decoder4(x))
            x = _spatial(self.decoder3(x))
            out = _spatial(self.decoder2(x))
            if self.feat_size[0] * 16 != self.spatial_size[0]:
                out = _spatial(
                    resize_linear_align_corners(out, self.spatial_size)
                )
            return self.out(out)

        dec4 = _spatial(self.proj_feat(x))
        enc4 = _spatial(self.encoder4(self.proj_feat(intermediates[-1])))
        dec3 = _spatial(self.decoder5(dec4, enc4))
        enc3 = _spatial(self.encoder3(self.proj_feat(intermediates[-2])))
        dec2 = _spatial(self.decoder4(dec3, enc3))
        enc2 = _spatial(self.encoder2(self.proj_feat(intermediates[-3])))
        dec1 = _spatial(self.decoder3(dec2, enc2))
        if self.feat_size[0] * 16 != self.spatial_size[0]:
            dec1 = _spatial(
                resize_linear_align_corners(dec1, self.spatial_size)
            )
        out = _spatial(self.decoder2(dec1, enc1))
        return self.out(out)

    # --------------------------------------------------------------- forward

    def __call__(
        self,
        x: jnp.ndarray,
        var_ids=None,
        seq_ps: Optional[jnp.ndarray] = None,
        x_seq: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, C, *spatial] image (channels-first, API parity). For the
        adaptive path, x_seq is the reassembled sqrt-len image
        [B, C, (sqrt_len*p)^d] (`train_unetr_simple.py:43-54`). Returns
        [B, num_classes, *spatial] logits."""
        enc_input = x_seq if self.adaptive_patching else x

        enc1 = None
        if self.skip_connection and not self.linear_decoder:
            # channels-first -> channels-last once at the boundary
            img = _spatial(jnp.moveaxis(x, 1, -1))
            enc1 = _spatial(self.encoder1(img))

        if self.skip_connection and not self.linear_decoder:
            tokens, intermediates = self.forward_intermediates(
                enc_input, var_ids, seq_ps, indices=self.skip_indices,
                deterministic=deterministic,
            )
        else:
            tokens = self.forward_features(
                enc_input, var_ids, seq_ps, deterministic
            )
            intermediates = None

        tokens = self.pool(tokens)
        out = self.unetr_head(tokens, intermediates, enc1, deterministic)
        return jnp.moveaxis(out, -1, 1)  # back to channels-first
