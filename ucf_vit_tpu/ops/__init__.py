from ucf_vit_tpu.ops.attention import AttnImpl, multi_head_attention
from ucf_vit_tpu.ops.patchify import patchify, unpatchify
from ucf_vit_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    sinusoidal_time_embedding_table,
)
