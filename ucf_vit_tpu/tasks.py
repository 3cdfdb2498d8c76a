"""Task registry: model factory + loss function per task.

Replaces the nine copy-pasted training scripts of the reference
(`training_scripts/*.py`) with one table. Each task provides:
  build_model(cfg)   -> flax module
  loss_fn(model,cfg) -> (params, batch, rng) -> (loss, aux) for the shared
                        train step (`parallel/train_step.py`).

Batch convention is the data-pipeline dict (`data/pipeline.py`); variables
are resolved to static var_ids on the host before jit (names are strings —
they must not enter the trace).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ucf_vit_tpu.config import Config
from ucf_vit_tpu.models import MAE, SAP, UNETR, VIT, DiffusionVIT, ddpm_schedule, q_sample
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.ops.patchify import patchify, unpatchify
from ucf_vit_tpu.utils.metrics import (
    accuracy,
    cross_entropy,
    dice_b_loss,
    dice_ce_loss,
    masked_mse,
    mse,
)


def _attn_impl(cfg: Config) -> AttnImpl:
    """Reference FusedAttn selection (`train_masked_fsdp.py:249-261`) maps
    data_type x gpu_type to a kernel; here any bf16-capable TPU run uses the
    Pallas kernel, f32 uses the XLA path, and configs may force one."""
    forced = cfg.trainer.get("attn_impl")
    if forced:
        return AttnImpl.from_string(forced)
    return AttnImpl.AUTO


def _common_kwargs(cfg: Config) -> dict:
    ia = cfg.init_args
    nd = 2 if cfg.twoD else 3
    return dict(
        img_size=tuple(cfg.tile_size[:nd]),
        patch_size=cfg.patch_size,
        in_chans=cfg.max_channels,
        embed_dim=int(ia.get("embed_dim", 768)),
        depth=int(ia.get("depth", 12)),
        num_heads=int(ia.get("num_heads", 12)),
        mlp_ratio=float(ia.get("mlp_ratio", 4)),
        drop_path_rate=float(ia.get("drop_path", 0.0)),
        # head / positional / token dropout knobs, same YAML keys as the
        # reference scripts (`train_class_simple.py:97,216`)
        drop_rate=float(ia.get("drop_rate", 0.0)),
        pos_drop_rate=float(ia.get("pos_drop_rate", 0.0)),
        patch_drop_rate=float(ia.get("patch_drop_rate", 0.0)),
        proj_drop_rate=float(ia.get("proj_drop_rate", 0.0)),
        attn_drop_rate=float(ia.get("attn_drop_rate", 0.0)),
        twoD=cfg.twoD,
        default_vars=tuple(cfg.default_vars),
        single_channel=cfg.single_channel,
        use_varemb=bool(ia.get("use_varemb", False)),
        adaptive_patching=cfg.adaptive_patching,
        fixed_length=cfg.fixed_length,
        # gate on adaptive_patching: reference configs set the flag even for
        # non-adaptive runs where the scripts never pass seq_ps
        # (e.g. configs/catsdogs/classification)
        use_adaptive_pos_emb=bool(ia.get("use_adaptive_pos_emb", False))
        and cfg.adaptive_patching,
        attn_impl=_attn_impl(cfg),
        # sp_mode rides the model (not a process global) so a trainer and a
        # server with different strategies coexist in one process
        sp_mode=str(cfg.parallelism.get("sp_mode", "auto")).lower(),
        # tanh-approx GELU by default (TPU perf); init_args.gelu_approx: false
        # restores the reference's exact erf (torch nn.GELU) numerics
        gelu_approx=bool(ia.get("gelu_approx", True)),
        remat=bool(cfg.trainer.get("remat", cfg.parallelism.get("fsdp_size", 1) > 1)),
        scan_layers=bool(
            cfg.trainer.get("scan_layers", ia.get("scan_layers", False))
            # pipelining needs the stacked-params layout scan provides
            or int(cfg.parallelism.get("pipe_par_size", 1)) > 1
        ),
        pipe_par_size=int(cfg.parallelism.get("pipe_par_size", 1)),
        pipe_microbatches=int(cfg.parallelism.get("pipe_microbatches", 0)),
        moe_num_experts=int(ia.get("moe_num_experts", 0)),
        moe_top_k=int(ia.get("moe_top_k", 2)),
        moe_capacity_factor=float(ia.get("moe_capacity_factor", 1.25)),
        moe_every=int(ia.get("moe_every", 2)),
        dtype=jnp.bfloat16 if cfg.trainer.get("data_type") == "bfloat16" else None,
    )


def reassemble_sqrt_len(tokens: jnp.ndarray, sqrt_len: int, p: int, twoD: bool):
    """[..., L, p^d] -> [..., (sqrt_len*p)^d] block reassembly for the
    sqrt-len adaptive method: token i is the (i-th in row-major leaf order)
    pxp(xp) block of the reassembled image. Shared by the UNETR/SAP training
    steps AND the inference CLI so train and eval agree on the input layout
    (the reference's own SAP step uses a locality-scrambling plain reshape,
    `train_sap_simple.py:30-40`; its commented-out einops rearrange — the
    evident intent — matches the UNETR layout `train_unetr_simple.py:43-47`,
    which is what this implements)."""
    lead = tokens.shape[:-2]
    n = len(lead)
    side = sqrt_len * p
    if twoD:
        t = tokens.reshape(lead + (sqrt_len, sqrt_len, p, p))
        t = jnp.moveaxis(t, n + 2, n + 1)  # (s1, p1, s2, p2)
        return t.reshape(lead + (side, side))
    t = tokens.reshape(lead + (sqrt_len,) * 3 + (p,) * 3)
    t = t.transpose(tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2, n + 5))
    return t.reshape(lead + (side,) * 3)


def disassemble_sqrt_len(img: jnp.ndarray, sqrt_len: int, p: int, twoD: bool):
    """Inverse of reassemble_sqrt_len: [..., (sqrt_len*p)^d] ->
    [..., L, p^d] row-major leaf tokens — used to deserialize adaptive
    predictions back to true image space via the quadtree/octree
    (reference visualization path, `inference_unetr_simple.py:426-457`)."""
    lead = img.shape[:-2] if twoD else img.shape[:-3]
    n = len(lead)
    if twoD:
        t = img.reshape(lead + (sqrt_len, p, sqrt_len, p))
        t = jnp.moveaxis(t, n + 1, n + 2)  # (s1, s2, p1, p2)
        return t.reshape(lead + (sqrt_len * sqrt_len, p * p))
    t = img.reshape(lead + (sqrt_len, p, sqrt_len, p, sqrt_len, p))
    t = t.transpose(tuple(range(n)) + (n, n + 2, n + 4, n + 1, n + 3, n + 5))
    return t.reshape(lead + (sqrt_len**3, p**3))


def _moe_args(cfg: Config) -> tuple:
    """(enabled, aux_weight) from init_args. moe_num_experts > 1 turns the
    dense MLPs of every moe_every-th encoder block into routed expert
    mixtures (models/moe.py; capability-plus — the reference has no MoE)."""
    ia = cfg.init_args
    enabled = int(ia.get("moe_num_experts", 0)) > 1
    return enabled, float(ia.get("moe_aux_weight", 0.01)) if enabled else 0.0


def _apply(model, variables, *args, **kwargs):
    """model.apply that also collects the MoE load-balance aux loss (0.0 for
    dense models) — the one place every task loss funnels through."""
    if getattr(model, "moe_num_experts", 0) > 1:
        from ucf_vit_tpu.models.moe import collect_moe_aux

        out, mut = model.apply(variables, *args, mutable="moe", **kwargs)
        return out, collect_moe_aux(mut)
    return model.apply(variables, *args, **kwargs), jnp.float32(0.0)


def _seq_ps(batch) -> Optional[jnp.ndarray]:
    """Assemble [B, L, 1+nd] (size, center...) descriptors. Parity:
    `train_unetr_simple.py:430-440` (squeeze channel, concat size+pos)."""
    if "seq_size" not in batch:
        return None
    size = batch["seq_size"][:, 0, :, None]  # [B, L, 1] (channel 0)
    pos = batch["seq_pos"][:, 0]  # [B, L, nd]
    return jnp.concatenate([size, pos], axis=-1)


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------


def build_classification(cfg: Config):
    ia = cfg.init_args
    model = VIT(
        num_classes=int(ia.get("num_classes", cfg.data.get("num_classes", 1000))),
        class_token=True,
        **_common_kwargs(cfg),
    )

    _, moe_w = _moe_args(cfg)

    def loss_fn(params, batch, rng, var_ids=None, deterministic=False):
        x = batch["seq"] if cfg.adaptive_patching else batch["x"]
        logits, moe_aux = _apply(
            model, {"params": params}, x, var_ids, _seq_ps(batch),
            deterministic=deterministic, rngs={"dropout": rng},
        )
        loss = cross_entropy(logits, batch["label"]) + moe_w * moe_aux
        return loss, {"accuracy": accuracy(logits, batch["label"])}

    return model, loss_fn


# ---------------------------------------------------------------------------
# mae
# ---------------------------------------------------------------------------


def build_mae(cfg: Config):
    ia = cfg.init_args
    model = MAE(
        class_token=False,
        mask_ratio=float(ia.get("mask_ratio", 0.75)),
        linear_decoder=bool(ia.get("linear_decoder", False)),
        decoder_depth=int(ia.get("decoder_depth", 8)),
        decoder_embed_dim=int(ia.get("decoder_embed_dim", 512)),
        decoder_num_heads=int(ia.get("decoder_num_heads", 16)),
        mlp_ratio_decoder=float(ia.get("mlp_ratio_decoder", 4)),
        seq_pack=int(ia.get("seq_pack", 1)),
        **_common_kwargs(cfg),
    )
    loss_name = cfg.model.get("loss_fn", "MSE")
    _, moe_w = _moe_args(cfg)

    def loss_fn(params, batch, rng, var_ids=None, deterministic=False):
        rng_mask, rng_drop = jax.random.split(rng)
        rngs = {"mask": rng_mask, "dropout": rng_drop}
        if cfg.adaptive_patching:
            seq = batch["seq"]  # [B, C, L, p^d]
            (pred, mask), moe_aux = _apply(
                model, {"params": params}, seq, var_ids, _seq_ps(batch),
                deterministic=deterministic, rngs=rngs,
            )
            b, c, l, p = seq.shape
            target = seq.transpose(0, 2, 3, 1).reshape(b, l, p * c)
            # parity: adaptive MAE uses full MSE (`train_masked_fsdp.py:39-46`)
            return mse(pred, target) + moe_w * moe_aux, {}
        data = batch["x"]
        (pred, mask), moe_aux = _apply(
            model, {"params": params}, data, var_ids, None,
            deterministic=deterministic, rngs=rngs,
        )
        target = patchify(data, cfg.patch_size, cfg.twoD)
        if loss_name == "maskMSE":
            return masked_mse(pred, target, mask) + moe_w * moe_aux, {}
        return mse(pred, target) + moe_w * moe_aux, {}

    return model, loss_fn


# ---------------------------------------------------------------------------
# unetr
# ---------------------------------------------------------------------------


def build_unetr(cfg: Config):
    ia = cfg.init_args
    num_classes = int(ia.get("num_classes", cfg.data.get("num_classes", 2)))
    model = UNETR(
        num_classes=num_classes,
        class_token=False,
        linear_decoder=bool(ia.get("linear_decoder", False)),
        feature_size=int(ia.get("feature_size", 16)),
        skip_connection=bool(ia.get("skip_connection", True)),
        sqrt_len_method=cfg.adaptive_patching,
        **_common_kwargs(cfg),
    )
    nd = 2 if cfg.twoD else 3
    sqrt_len = cfg.sqrt_len
    p = cfg.patch_size

    _, moe_w = _moe_args(cfg)

    def loss_fn(params, batch, rng, var_ids=None, deterministic=False):
        data = batch["x"]
        if cfg.adaptive_patching:
            # reassemble token seq into the sqrt-len image
            # (`train_unetr_simple.py:43-54`)
            seq = reassemble_sqrt_len(batch["seq"], sqrt_len, p, cfg.twoD)
            logits, moe_aux = _apply(
                model, {"params": params}, data, var_ids, _seq_ps(batch), seq,
                deterministic=deterministic, rngs={"dropout": rng},
            )
        else:
            logits, moe_aux = _apply(
                model, {"params": params}, data, var_ids, None, None,
                deterministic=deterministic, rngs={"dropout": rng},
            )
        label = batch["label"]
        if label.ndim == logits.ndim - 1:
            label = label[:, None]
        return dice_ce_loss(logits, label, num_classes) + moe_w * moe_aux, {}

    return model, loss_fn


# ---------------------------------------------------------------------------
# sap
# ---------------------------------------------------------------------------


def build_sap(cfg: Config):
    ia = cfg.init_args
    num_classes = int(ia.get("num_classes", cfg.data.get("num_classes", 2)))
    model = SAP(
        num_classes=num_classes,
        class_token=False,
        sqrt_len_method=cfg.adaptive_patching,
        **_common_kwargs(cfg),
    )
    sqrt_len = cfg.sqrt_len
    p = cfg.patch_size

    _, moe_w = _moe_args(cfg)

    def loss_fn(params, batch, rng, var_ids=None, deterministic=False):
        # SAP always runs the adaptive sqrt-len path (`train_sap_simple.py:28-46`).
        seq = batch["seq"]  # [B, C, L, p^d]
        b = seq.shape[0]
        seq_img = reassemble_sqrt_len(seq, sqrt_len, p, cfg.twoD)
        logits, moe_aux = _apply(
            model, {"params": params}, seq_img, var_ids, _seq_ps(batch),
            deterministic=deterministic, rngs={"dropout": rng},
        )
        # serialized labels [B, L, p, p(, p)] -> image space, then one-hot
        seq_label = batch["seq_label"].astype(jnp.int32)
        flat = seq_label.reshape(b, seq_label.shape[1], -1)  # [B, L, p^d]
        label_img = reassemble_sqrt_len(flat, sqrt_len, p, cfg.twoD)
        onehot = jax.nn.one_hot(label_img, num_classes, axis=1)
        return dice_b_loss(logits, onehot) + moe_w * moe_aux, {}

    return model, loss_fn


# ---------------------------------------------------------------------------
# diffusion
# ---------------------------------------------------------------------------


def build_diffusion(cfg: Config):
    ia = cfg.init_args
    time_steps = int(ia.get("num_time_steps", ia.get("time_steps", 1000)))
    model = DiffusionVIT(
        class_token=False,
        linear_decoder=bool(ia.get("linear_decoder", False)),
        decoder_depth=int(ia.get("decoder_depth", 8)),
        decoder_embed_dim=int(ia.get("decoder_embed_dim", 512)),
        decoder_num_heads=int(ia.get("decoder_num_heads", 16)),
        mlp_ratio_decoder=float(ia.get("mlp_ratio_decoder", 4)),
        time_steps=time_steps,
        **_common_kwargs(cfg),
    )
    schedule = ddpm_schedule(time_steps)
    _, moe_w = _moe_args(cfg)

    def loss_fn(params, batch, rng, var_ids=None, deterministic=False):
        x0 = batch["x"]
        rng_t, rng_e, rng_drop = jax.random.split(rng, 3)
        t = jax.random.randint(rng_t, (x0.shape[0],), 0, time_steps)
        e = jax.random.normal(rng_e, x0.shape, x0.dtype)
        xt = q_sample(schedule, x0, t, e)
        pred, moe_aux = _apply(
            model, {"params": params}, xt, t, var_ids, None,
            deterministic=deterministic, rngs={"dropout": rng_drop},
        )
        pred_img = unpatchify(pred, x0.shape, cfg.patch_size, cfg.twoD)
        return mse(pred_img, e) + moe_w * moe_aux, {}

    return model, loss_fn


TASKS: Dict[str, Callable] = {
    "classification": build_classification,
    "mae": build_mae,
    "unetr": build_unetr,
    "sap": build_sap,
    "diffusion": build_diffusion,
}


def build_task(cfg: Config):
    return TASKS[cfg.task](cfg)
