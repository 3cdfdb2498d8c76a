"""VIT encoder + classification head.

Capability parity with reference `src/UCF_VIT/simple/arch.py:101-489` (and the
TP flavor `fsdp/arch.py:103-501` — same module, parallelism comes from the
mesh sharding rules, not a code fork). Features: 2D/3D conv patch embed,
adaptive-patching linear token embeds, per-variable embeds + variable
aggregation (cross attention), learned/sincos/adaptive-MLP positional
embeddings, class token, stochastic depth, classification head.

Deliberate deviations from reference quirks (documented in SURVEY.md §"do not
replicate"):
- per-variable conv token embeds are actually independent modules (reference
  `simple/arch.py:292-295` shares one instance across variables);
- deterministic full-key initialization (all ranks derive identical params
  from one PRNG key; the reference only syncs non-block weights,
  `train_masked_fsdp.py:319-337`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ucf_vit_tpu.models.blocks import (
    AdaptivePosMLP,
    Block,
    LinearTokenEmbed,
    PatchEmbed,
    VariableMappingAttention,
    layer_norm,
    pdense,
    zeros_init,
)
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
)


class _ScanBlockBody(nn.Module):
    """nn.scan body: one Block applied to the carry; also emits the layer
    output so forward_intermediates can slice per-layer activations."""

    block_cls: type
    block_kwargs: dict

    @nn.compact
    def __call__(self, x, deterministic):
        x = self.block_cls(drop_path=0.0, name="block", **self.block_kwargs)(
            x, deterministic
        )
        return x, x


def run_pipelined_stack(
    scan_module, block_kwargs: dict, pipe_par_size: int,
    pipe_microbatches: int, x: jnp.ndarray, take_indices: tuple = (),
):
    """GPipe a scan-stacked Block sequence over the mesh 'pp' axis
    (parallel/pipeline.py) — shared by the encoder and the MAE/diffusion
    decoder stacks. The stacked params are read off the BOUND nn.scan
    submodule (gradients flow: `.variables` returns the live traced
    arrays) and each layer slice is applied through a detached pure Block
    (parent=None: declares no params, it is only an applier).

    Returns (y, taps_or_None, moe_aux_scalar). For MoE blocks the sow'd
    load-balance losses are extracted per layer application and averaged
    by the schedule (callers re-sow the scalar so collect_moe_aux sees it).
    """
    from flax.core import meta as flax_meta

    from ucf_vit_tpu.ops.attention import _active_mesh
    from ucf_vit_tpu.parallel.pipeline import pipeline_blocks

    stacked = flax_meta.unbox(scan_module.variables["params"])["block"]
    blk = Block(drop_path=0.0, parent=None, **block_kwargs)
    moe_on = block_kwargs.get("moe_num_experts", 0) > 1

    if moe_on:
        def apply_layer(p, t):
            y, mut = blk.apply({"params": p}, t, True, mutable="moe")
            leaves = jax.tree.leaves(mut.get("moe", {}))
            aux = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return y, aux
    else:
        def apply_layer(p, t):
            return blk.apply({"params": p}, t, True)

    return pipeline_blocks(
        apply_layer,
        stacked,
        x,
        mesh=_active_mesh(),
        pp_size=pipe_par_size,
        num_microbatches=pipe_microbatches,
        take_indices=take_indices,
    )


def _to_tuple(img_size, twoD: bool) -> Tuple[int, ...]:
    n = 2 if twoD else 3
    if isinstance(img_size, int):
        return (img_size,) * n
    t = tuple(img_size)
    assert len(t) == n, f"img_size {img_size} does not match twoD={twoD}"
    return t


class VIT(nn.Module):
    """ViT encoder (+ optional classification head)."""

    img_size: Tuple[int, ...] = (224, 224)
    patch_size: int = 16
    in_chans: int = 3
    num_classes: Optional[int] = None
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    class_token: bool = True
    pos_embed: str = "learn"  # '', 'none', or 'learn'
    drop_rate: float = 0.0
    pos_drop_rate: float = 0.0
    patch_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    twoD: bool = True
    adaptive_patching: bool = False
    fixed_length: Optional[int] = None
    default_vars: Optional[Tuple[str, ...]] = None
    single_channel: bool = False
    use_varemb: bool = False
    attn_impl: AttnImpl = AttnImpl.AUTO
    # sequence-parallel attention strategy under sp > 1 (ops/attention.py
    # SP_MODES); a model property like attn_impl so two models with
    # different strategies coexist in one process (no module global)
    sp_mode: str = "auto"
    use_adaptive_pos_emb: bool = False
    sqrt_len_method: bool = False
    remat: bool = False  # activation checkpointing on each Block
    scan_layers: bool = False  # lax.scan over blocks (O(1) compile in depth)
    # GPipe pipeline parallelism over the mesh 'pp' axis (capability-plus:
    # the reference has none). Requires scan_layers (stacked block params)
    # and in-block dropout == 0. pipe_microbatches 0 = auto (parallel/
    # pipeline.pick_microbatches).
    pipe_par_size: int = 1
    pipe_microbatches: int = 0
    # MoE encoder blocks (capability-plus: reference has no MoE/EP —
    # SURVEY §2.5). moe_num_experts > 1 swaps the dense MLP for a top-k
    # routed expert mixture (models/moe.py) in every `moe_every`-th block
    # (V-MoE's every-2 placement by default; blocks 1,3,5,... are MoE).
    # Expert weights shard over the mesh 'ep' axis
    # (parallelism.expert_par_size).
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_every: int = 2
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 policy)
    # tanh-approx GELU is the TPU perf default (~40% cheaper on the VPU);
    # the reference uses exact erf (torch nn.GELU) — set
    # init_args.gelu_approx: false in the config for bit-level parity.
    gelu_approx: bool = True

    # ---------------------------------------------------------------- config

    @property
    def spatial_size(self) -> Tuple[int, ...]:
        return _to_tuple(self.img_size, self.twoD)

    @property
    def grid_size(self) -> Tuple[int, ...]:
        return tuple(s // self.patch_size for s in self.spatial_size)

    @property
    def sqrt_len(self) -> int:
        """Side length of the square/cube token grid for the sqrt-len adaptive
        method: round(fixed_length ** (1/ndim)). Parity: the `sqrt_len` arg the
        reference threads into UNETR/SAP (`train_unetr_simple.py:212-217`)."""
        assert self.fixed_length is not None
        ndim = 2 if self.twoD else 3
        return int(round(self.fixed_length ** (1.0 / ndim)))

    @property
    def num_patches(self) -> int:
        if self.adaptive_patching:
            assert self.fixed_length is not None
            if self.sqrt_len_method:
                # Tokens come from patch-embedding the reassembled
                # sqrt-len image, giving sqrt_len^ndim == fixed_length tokens.
                # (The reference computes num_patches from img_size here —
                # a latent mismatch its configs dodge via use_adaptive_pos_emb;
                # we use the actual token count.)
                ndim = 2 if self.twoD else 3
                return self.sqrt_len**ndim
            return self.fixed_length
        return int(np.prod(self.grid_size))

    @property
    def num_prefix_tokens(self) -> int:
        return 1 if self.class_token else 0

    @property
    def embed_len(self) -> int:
        return self.num_patches + self.num_prefix_tokens

    @property
    def patch_dim(self) -> int:
        ndim = 2 if self.twoD else 3
        return self.in_chans * self.patch_size**ndim

    @property
    def patch_dim_woc(self) -> int:
        ndim = 2 if self.twoD else 3
        return self.patch_size**ndim

    @property
    def aggregated_variables(self) -> int:
        return 1

    def var_map(self) -> dict:
        assert self.default_vars is not None
        return {v: i for i, v in enumerate(self.default_vars)}

    def get_var_ids(self, variables: Sequence[str]) -> Tuple[int, ...]:
        """Host-side: map variable names -> static int ids for the jit trace."""
        m = self.var_map()
        return tuple(m[v] for v in variables)

    # ---------------------------------------------------------------- params

    def _sincos_pos_init(self, with_cls: bool):
        """Init fn producing the sincos table (or random for adaptive)."""
        if self.adaptive_patching and not self.sqrt_len_method:
            def init(key, shape, dtype=jnp.float32):
                return 0.02 * jax.random.normal(key, shape, dtype)
            return init

        if self.adaptive_patching:
            # sqrt-len method: tokens form a (sqrt_len,)^ndim grid, not the
            # img_size/patch grid.
            g = (self.sqrt_len,) * (2 if self.twoD else 3)
        else:
            g = self.grid_size
        if self.twoD:
            table = get_2d_sincos_pos_embed(self.embed_dim, g[0], g[1], cls_token=with_cls)
        else:
            table = get_3d_sincos_pos_embed(
                self.embed_dim, g[0], g[1], g[2], cls_token=with_cls
            )

        def init(key, shape, dtype=jnp.float32):
            del key
            return jnp.asarray(table[None], dtype).reshape(shape)

        return init

    def setup(self):
        assert self.pos_embed in ("", "none", "learn")
        adaptive_linear = self.adaptive_patching and not self.sqrt_len_method

        # --- token embeds --------------------------------------------------
        if adaptive_linear:
            if self.use_varemb:
                self.token_embeds = [
                    LinearTokenEmbed(self.embed_dim, name=f"token_embed_{i}")
                    for i in range(len(self.default_vars))
                ]
            else:
                self.token_embeds = LinearTokenEmbed(self.embed_dim, name="token_embed")
        else:
            if self.use_varemb:
                self.token_embeds = [
                    PatchEmbed(
                        patch_size=self.patch_size,
                        embed_dim=self.embed_dim,
                        twoD=self.twoD,
                        dtype=self.dtype,
                        name=f"token_embed_{i}",
                    )
                    for i in range(len(self.default_vars))
                ]
            else:
                self.token_embeds = PatchEmbed(
                    patch_size=self.patch_size,
                    embed_dim=self.embed_dim,
                    twoD=self.twoD,
                    dtype=self.dtype,
                    name="token_embed",
                )

        # --- prefix token / positional embedding ---------------------------
        if self.class_token:
            self.cls_token = self.param(
                "cls_token",
                nn.with_partitioning(
                    nn.initializers.normal(stddev=1e-6), (None, None, "embed")
                ),
                (1, 1, self.embed_dim),
            )

        if self.pos_embed == "learn":
            self.pos_embed_param = self.param(
                "pos_embed",
                nn.with_partitioning(
                    self._sincos_pos_init(with_cls=self.class_token),
                    (None, None, "embed"),
                ),
                (1, self.embed_len, self.embed_dim),
            )

        if self.use_adaptive_pos_emb:
            self.adaptive_pos_dep_emb = AdaptivePosMLP(
                self.embed_dim, name="adaptive_pos_dep_emb"
            )

        # --- variable embedding / aggregation -------------------------------
        if self.use_varemb:
            n_vars = len(self.default_vars)
            var_table = get_1d_sincos_pos_embed_from_grid(
                self.embed_dim, np.arange(n_vars)
            )
            self.var_embed = self.param(
                "var_embed",
                nn.with_partitioning(
                    lambda key, shape, dtype=jnp.float32: jnp.asarray(
                        var_table[None], dtype
                    ).reshape(shape),
                    (None, None, "embed"),
                ),
                (1, n_vars, self.embed_dim),
            )
            if not (self.single_channel or n_vars == 1):
                self.var_query = self.param(
                    "var_query",
                    nn.with_partitioning(zeros_init, (None, None, "embed")),
                    (1, self.aggregated_variables, self.embed_dim),
                )
                self.var_agg = VariableMappingAttention(
                    dim=self.embed_dim,
                    num_heads=self.num_heads,
                    attn_impl=self.attn_impl,
                    qkv_bias=False,
                    dtype=self.dtype,
                    name="var_agg",
                )

        # --- transformer stack ----------------------------------------------
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))  # 2: flax core fn is (module, x, deterministic)
        block_kwargs = dict(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            sp_mode=self.sp_mode,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            init_values=self.init_values,
            proj_drop=self.proj_drop_rate,
            attn_drop=self.attn_drop_rate,
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            seg_len=self._block_seg_len(),
        )
        moe_on = self.moe_num_experts > 1
        if moe_on and (self.scan_layers or self.pipe_par_size > 1):
            # scan stacks one homogeneous Block: every layer is MoE
            assert self.moe_every == 1, (
                "scan_layers stacks identical blocks; MoE under scan "
                "requires moe_every == 1 (or use scan_layers=False for "
                "the V-MoE every-2 placement)"
            )
            block_kwargs.update(
                moe_num_experts=self.moe_num_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
            )
        if self.pipe_par_size > 1:
            assert self.scan_layers, (
                "pipe_par_size > 1 requires scan_layers (block params must "
                "be stacked [depth, ...] so stages shard over the pp axis)"
            )
            assert self.depth % self.pipe_par_size == 0, (
                f"depth {self.depth} not divisible by pipe_par_size "
                f"{self.pipe_par_size}"
            )
            assert self.proj_drop_rate == 0.0 and self.attn_drop_rate == 0.0, (
                "pipe_par_size > 1 runs blocks as a pure pipelined schedule "
                "(no per-layer rng threading); in-block dropout must be 0"
            )
            # the pipeline applies a detached Block purely per layer slice
            self._pipe_block_kwargs = dict(block_kwargs)
        if self.scan_layers:
            # lax.scan over one stacked Block: compile time O(1) in depth —
            # the big-model pattern the reference cannot express with its
            # per-layer module lists. Stochastic depth varies per layer, so
            # scan requires drop_path_rate == 0 (all shipped configs use 0).
            assert self.drop_path_rate == 0.0, (
                "scan_layers requires drop_path_rate == 0"
            )
            self.blocks_scan = nn.scan(
                _ScanBlockBody,
                length=self.depth,
                # "moe": per-layer sow'd aux losses stack on a leading axis
                variable_axes={"params": 0, "moe": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(block_cls=block_cls, block_kwargs=block_kwargs, name="blocks")
            self.blocks = None
        else:
            dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
            self.blocks = [
                block_cls(
                    drop_path=float(dpr[i]),
                    name=f"blocks_{i}",
                    **(
                        dict(
                            block_kwargs,
                            moe_num_experts=self.moe_num_experts,
                            moe_top_k=self.moe_top_k,
                            moe_capacity_factor=self.moe_capacity_factor,
                        )
                        if moe_on and i % self.moe_every == self.moe_every - 1
                        else block_kwargs
                    ),
                )
                for i in range(self.depth)
            ]
        self.norm = layer_norm(name="norm")

        # --- head -------------------------------------------------------------
        self._setup_head()

        self.pos_drop = nn.Dropout(self.pos_drop_rate)
        self.head_drop = nn.Dropout(self.drop_rate)

    def _setup_head(self):
        """Classification head; dense-prediction subclasses override (the
        reference instead sets `self.head = None` after super().__init__,
        e.g. `simple/arch.py:496`)."""
        if self.num_classes is not None and self.num_classes > 0:
            self.head = pdense(
                self.num_classes, kernel_axes=("embed", "classes"), name="head"
            )
        else:
            self.head = None

    # ------------------------------------------------------------- embedding

    def embed_tokens(
        self,
        x: jnp.ndarray,
        var_ids: Optional[Tuple[int, ...]],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Tokenize input -> [B, L, D] (after variable aggregation if any)."""
        adaptive_linear = self.adaptive_patching and not self.sqrt_len_method
        if self.use_varemb:
            assert var_ids is not None, "use_varemb requires var_ids"
            if self.single_channel:
                vid = var_ids[0]
                if adaptive_linear:
                    x = self.token_embeds[vid](x[:, 0])  # [B, S, p^d] -> [B, L, D]
                else:
                    x = self.token_embeds[vid](x)  # [B, 1, *spatial]
                var_embed = self.var_embed[:, (vid,), :]  # [1, 1, D]
                x = x + var_embed
                return x
            embeds = []
            for i, vid in enumerate(var_ids):
                if adaptive_linear:
                    embeds.append(self.token_embeds[vid](x[:, i]))
                else:
                    embeds.append(self.token_embeds[vid](x[:, i : i + 1]))
            x = jnp.stack(embeds, axis=1)  # [B, V, L, D]
            ids = jnp.asarray(var_ids)
            var_embed = self.var_embed[:, ids, :]  # [1, V, D]
            if len(var_ids) > 1:
                x = x + var_embed[:, :, None, :]
                x = self.aggregate_variables(x, deterministic)  # [B, L, D]
            else:
                x = x[:, 0] + var_embed[:, 0][:, None, :]
            return x
        else:
            if adaptive_linear:
                # [B, C, S, p^d] -> [B, S, p^d * C] (channel fastest)
                b, c, s, p = x.shape
                x = x.transpose(0, 2, 3, 1).reshape(b, s, p * c)
                return self.token_embeds(x)
            return self.token_embeds(x)

    def aggregate_variables(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, V, L, D] -> [B, L, D] via 1-query cross attention.

        Parity: reference `simple/arch.py:414-432`.
        """
        b, v, l, d = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(b * l, v, d)  # [B*L, V, D]
        var_query = jnp.broadcast_to(
            self.var_query, (b * l, self.aggregated_variables, d)
        )
        x = self.var_agg(var_query, x, deterministic)  # [B*L, 1, D]
        x = x.reshape(b, l, self.aggregated_variables, d)
        return x[:, :, 0]  # aggregated_variables == 1

    def apply_pos_embed(
        self,
        x: jnp.ndarray,
        seq_ps: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Add positional embedding (+ class token). Parity: `simple/arch.py:367-393`."""
        if self.pos_embed in ("", "none"):
            return x.reshape(x.shape[0], -1, x.shape[-1])

        if self.use_adaptive_pos_emb:
            assert seq_ps is not None, "use_adaptive_pos_emb requires seq_ps"
            pos = self.adaptive_pos_dep_emb(seq_ps)  # [B, L, D]
        else:
            pos = self.pos_embed_param
        # keep the residual stream in the compute dtype (a f32 pos table
        # would silently promote every residual add to f32)
        pos = pos.astype(x.dtype)

        if self.class_token:
            cls = jnp.broadcast_to(
                self.cls_token, (x.shape[0], 1, self.embed_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
            if self.use_adaptive_pos_emb:
                zero = jnp.zeros((x.shape[0], 1, self.embed_dim), pos.dtype)
                pos = jnp.concatenate([zero, pos], axis=1)
        x = x + pos
        return self.pos_drop(x, deterministic=deterministic)

    def patch_drop(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """timm-semantics PatchDropout (reference `simple/arch.py:240-246`,
        applied after `_pos_embed` at `:473`): at train time keep a random
        `max(1, int(L * (1 - rate)))` subset of the non-prefix tokens
        (unordered, per-sample); identity at eval. The keep count is static,
        so the jit trace keeps fixed shapes."""
        if self.patch_drop_rate <= 0 or deterministic:
            return x
        npt = self.num_prefix_tokens
        prefix, tokens = x[:, :npt], x[:, npt:]
        b, l, _ = tokens.shape
        num_keep = max(1, int(l * (1.0 - self.patch_drop_rate)))
        noise = jax.random.uniform(self.make_rng("dropout"), (b, l))
        keep = jnp.argsort(noise, axis=-1)[:, :num_keep]
        tokens = jnp.take_along_axis(tokens, keep[:, :, None], axis=1)
        if npt:
            return jnp.concatenate([prefix, tokens], axis=1)
        return tokens

    # --------------------------------------------------------------- encoder

    def _block_seg_len(self):
        """Segment length for block-diagonal attention in the encoder stack.
        None = ordinary full attention; MAE overrides this when sequence
        packing (seq_pack > 1) folds several samples into one sequence."""
        return None

    def run_blocks(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        # during init the sequential scan path must run so blocks_scan
        # CREATES its (stacked) params; the pipeline only reads them
        if self.pipe_par_size > 1 and not self.is_initializing():
            y, _, aux = self._run_blocks_pipelined(x)
            if self.moe_num_experts > 1:
                # re-sow the schedule-averaged MoE load-balance loss so the
                # task's collect_moe_aux sees it like the scan path's sows
                self.sow("moe", "aux_loss", aux)
            return y
        if self.scan_layers:
            x, _ = self.blocks_scan(x, deterministic)
            return x
        for blk in self.blocks:
            x = blk(x, deterministic)
        return x

    def _run_blocks_pipelined(self, x: jnp.ndarray, take_indices: tuple = ()):
        return run_pipelined_stack(
            self.blocks_scan,
            self._pipe_block_kwargs,
            self.pipe_par_size,
            self.pipe_microbatches,
            x,
            take_indices=take_indices,
        )

    def forward_features(
        self,
        x: jnp.ndarray,
        var_ids: Optional[Tuple[int, ...]] = None,
        seq_ps: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.embed_tokens(x, var_ids, deterministic)
        x = self.apply_pos_embed(x, seq_ps, deterministic)
        x = self.patch_drop(x, deterministic)
        x = self.run_blocks(x, deterministic)
        return self.norm(x)

    def forward_intermediates(
        self,
        x: jnp.ndarray,
        var_ids: Optional[Tuple[int, ...]] = None,
        seq_ps: Optional[jnp.ndarray] = None,
        indices: Optional[Sequence[int]] = None,
        deterministic: bool = True,
    ):
        """Encoder forward returning (normed output, list of intermediates).

        Intermediates are spatial tokens only (prefix stripped), un-normed —
        parity with reference `simple/arch.py:995-1086`.
        """
        take = list(indices or [])
        x = self.embed_tokens(x, var_ids, deterministic)
        x = self.apply_pos_embed(x, seq_ps, deterministic)
        x = self.patch_drop(x, deterministic)
        if self.pipe_par_size > 1 and not self.is_initializing():
            # GPipe with skip taps: each intermediate's owning stage writes
            # it into the tap buffer the schedule psums out at the end
            # (parallel/pipeline.py take_indices)
            y, taps, aux = self._run_blocks_pipelined(
                x, take_indices=tuple(take)
            )
            if self.moe_num_experts > 1:
                self.sow("moe", "aux_loss", aux)
            intermediates = [
                taps[i][:, self.num_prefix_tokens :] for i in range(len(take))
            ]
            return self.norm(y), intermediates
        if self.scan_layers:
            x, ys = self.blocks_scan(x, deterministic)  # ys: [depth, B, L, D]
            intermediates = [ys[i][:, self.num_prefix_tokens :] for i in take]
            return self.norm(x), intermediates
        intermediates = []
        for i, blk in enumerate(self.blocks):
            x = blk(x, deterministic)
            if i in take:
                intermediates.append(x[:, self.num_prefix_tokens :])
        return self.norm(x), intermediates

    def pool(self, x: jnp.ndarray) -> jnp.ndarray:
        """Class-token pool (or strip prefix). Parity: `simple/arch.py:90-99`."""
        if self.num_prefix_tokens == 1:
            return x[:, 0]
        return x[:, self.num_prefix_tokens :]

    def forward_head(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.pool(x)
        x = self.head_drop(x, deterministic=deterministic)
        if self.head is None:
            return x
        return self.head(x)

    def __call__(
        self,
        x: jnp.ndarray,
        var_ids: Optional[Tuple[int, ...]] = None,
        seq_ps: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.forward_features(x, var_ids, seq_ps, deterministic)
        return self.forward_head(x, deterministic)
