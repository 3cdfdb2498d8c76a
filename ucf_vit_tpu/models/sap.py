"""SAP: ViT encoder + ConvTranspose neck + 1x1 mask head (segmentation with
adaptive patching via the sqrt-len method).

Capability parity with reference `src/UCF_VIT/simple/arch.py:491-536`
(`fsdp/arch.py:503-548`): tokens are reshaped to a (sqrt_len)^d grid,
upsampled by one ConvTranspose(embed_dim -> 256, kernel=stride=patch_size),
then 1x1-conv'd to class logits. Caller reassembles the adaptive token
sequence into the sqrt-len image before the forward
(`train_sap_simple.py:28-46`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ucf_vit_tpu.models.unet_blocks import conv, transp_conv
from ucf_vit_tpu.models.vit import VIT

NECK_CHANNELS = 256  # reference hard-codes 256 (`simple/arch.py:503`)


class SAP(VIT):
    """Use class_token=False (reference `train_sap_simple.py:248`)."""

    @property
    def ndim(self) -> int:
        return 2 if self.twoD else 3

    def _setup_head(self):
        self.head = None  # reference: `simple/arch.py:496`

    def setup(self):
        assert not self.class_token, "SAP runs with class_token=False"
        assert self.patch_drop_rate == 0.0, (
            "SAP consumes the full spatial token grid (intermediates are "
            "reshaped to the grid), so patch_drop_rate > 0 would crash with "
            "a bare reshape error at train time — set patch_drop_rate: 0 "
            "(the reference shares this constraint, simple/arch.py:1059)"
        )
        super().setup()
        self.neck = transp_conv(
            NECK_CHANNELS, self.patch_size, self.ndim, bias=False, name="neck"
        )
        self.mask_header = conv(
            self.num_classes, 1, 1, self.ndim, name="mask_header"
        )

    def mask_head(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, L, D] -> [B, *(side*p), classes] (channels-last internally).
        Parity: `simple/arch.py:524-532`."""
        b, l, d = x.shape
        side = self.sqrt_len if self.adaptive_patching else None
        if side is None:
            grid = self.grid_size
        else:
            grid = (side,) * self.ndim
        x = x.reshape((b,) + grid + (d,))
        x = self.neck(x)
        return self.mask_header(x)

    def __call__(
        self,
        x: jnp.ndarray,
        var_ids=None,
        seq_ps: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, C, *spatial] (the reassembled sqrt-len image when adaptive).
        Returns [B, num_classes, *spatial] logits."""
        tokens = self.forward_features(x, var_ids, seq_ps, deterministic)
        tokens = self.pool(tokens)
        out = self.mask_head(tokens)
        return jnp.moveaxis(out, -1, 1)
