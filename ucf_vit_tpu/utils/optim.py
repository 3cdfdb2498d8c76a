"""Optimizer + LR schedule factory (optax).

Capability parity with reference `src/UCF_VIT/utils/misc.py:58-96`
(`configure_optimizer`: AdamW with a no-weight-decay group for params whose
name contains var_embed / pos_embed / time_pos_embed) and
`src/UCF_VIT/utils/lr_scheduler.py:12-94` (LinearWarmupCosineAnnealingLR,
stepped per iteration).

Also provides dynamic loss scaling covering the reference's
ShardedGradScaler(init_scale=8192, growth_interval=100, min_scale=128)
(`train_masked_fsdp.py:417-419,601-606`) — on TPU this matters only for f16;
bf16 training generally runs unscaled, but the knob is kept for config parity.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_SUBSTRINGS = ("var_embed", "pos_embed", "time_pos_embed")


def warmup_cosine_schedule(
    lr: float,
    warmup_steps: int,
    max_steps: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """Closed form of the reference LinearWarmupCosineAnnealingLR.

    Linear from warmup_start_lr to lr over warmup_steps (the reference's
    chainable form reaches base lr at step == warmup_steps with slope
    (lr - warmup_start_lr)/(warmup_steps - 1)), then cosine to eta_min at
    max_steps.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 1:
            warm = warmup_start_lr + step * (lr - warmup_start_lr) / (warmup_steps - 1)
        else:
            warm = jnp.asarray(lr, jnp.float32)
        denom = max(max_steps - warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        cos = eta_min + 0.5 * (lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def _unbox(tree):
    """Strip flax Partitioned metadata boxes if present (accepts either a
    boxed init/eval_shape tree or raw arrays)."""
    try:
        import flax.linen as nn
    except ImportError:  # pragma: no cover
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.unbox() if isinstance(x, nn.Partitioned) else x,
        tree,
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )


def _no_decay_mask(params) -> Any:
    """True where weight decay applies (reference substring rule inverted)."""
    params = _unbox(params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decay_for_path(path) -> bool:
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        joined = "/".join(names)
        return not any(s in joined for s in NO_DECAY_SUBSTRINGS)

    paths = [p for p, _ in flat]
    leaves = [decay_for_path(p) for p in paths]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def configure_optimizer(
    params,
    lr: float,
    beta_1: float = 0.9,
    beta_2: float = 0.95,
    weight_decay: float = 1e-5,
    warmup_steps: int = 1000,
    max_steps: int = 20000,
    warmup_start_lr: float = 1e-8,
    eta_min: float = 1e-8,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine with the reference's no-decay param grouping."""
    schedule = warmup_cosine_schedule(lr, warmup_steps, max_steps, warmup_start_lr, eta_min)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=beta_1,
        b2=beta_2,
        weight_decay=weight_decay,
        mask=_no_decay_mask(params),
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


class LossScaleState(NamedTuple):
    scale: jnp.ndarray  # current loss scale (f32 scalar)
    growth_counter: jnp.ndarray  # consecutive finite steps (i32 scalar)


def init_loss_scale(init_scale: float = 8192.0) -> LossScaleState:
    return LossScaleState(
        scale=jnp.asarray(init_scale, jnp.float32),
        growth_counter=jnp.asarray(0, jnp.int32),
    )


def update_loss_scale(
    state: LossScaleState,
    grads_finite: jnp.ndarray,
    growth_interval: int = 100,
    growth_factor: float = 2.0,
    backoff_factor: float = 0.5,
    min_scale: float = 128.0,
    max_scale: float = 2.0**24,
) -> LossScaleState:
    """Dynamic loss-scale update: grow after `growth_interval` finite steps,
    back off (floored at min_scale) on overflow. Parity:
    ShardedGradScaler(init_scale=8192, growth_interval=100) + the manual
    min_scale=128 floor in `train_masked_fsdp.py:601-606`."""
    counter = jnp.where(grads_finite, state.growth_counter + 1, 0)
    grow = counter >= growth_interval
    scale = jnp.where(
        grads_finite,
        jnp.where(grow, jnp.minimum(state.scale * growth_factor, max_scale), state.scale),
        jnp.maximum(state.scale * backoff_factor, min_scale),
    )
    counter = jnp.where(grow, 0, counter)
    return LossScaleState(scale=scale, growth_counter=counter)


def all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(l.astype(jnp.float32))) for l in leaves])
    )
