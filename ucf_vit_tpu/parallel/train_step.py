"""Sharded train-state creation + generic jitted train step.

Replaces the reference's per-script training plumbing
(`training_scripts/*.py`, nine copy-pasted loops): one train-step factory
shared by every task, with GSPMD sharding derived from the logical axis
metadata flax records at parameter creation.

Covers, TPU-natively:
- FSDP FULL/HYBRID/NO_SHARD wrapping (`train_masked_fsdp.py:384-391`)
  -> params sharded per LOGICAL_RULES over the mesh, optimizer state
  inherits the same shardings.
- MixedPrecision bf16 policy (`train_masked_fsdp.py:375-381`)
  -> params stay f32; the model computes in bf16 when `dtype=bf16` is set
  on the module (flax casts per-layer).
- ShardedGradScaler (`train_masked_fsdp.py:417-419`) -> optional dynamic
  loss scaling from utils/optim.py.
- activation checkpointing (`train_masked_fsdp.py:393-396`)
  -> `remat=True` on the model (nn.remat around each Block).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from flax import struct
from jax.sharding import Mesh

from ucf_vit_tpu.parallel.mesh import LOGICAL_RULES
from ucf_vit_tpu.utils.optim import (
    LossScaleState,
    all_finite,
    init_loss_scale,
    update_loss_scale,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    loss_scale: Optional[LossScaleState] = None
    # Exponential moving average of params (trainer.ema_decay; None = off).
    # Capability-plus over the reference: standard for MAE/diffusion
    # pretraining, and nearly free on TPU — the update is one fused
    # elementwise map riding the jitted step, sharded exactly like params.
    ema_params: Any = None


def unbox(tree):
    """Strip flax Partitioned metadata boxes -> raw arrays."""
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, nn.Partitioned) else x,
        tree,
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )


def logical_state_sharding(state_shapes, mesh: Mesh):
    """PartitionSpec pytree for a TrainState whose params carry logical axes.

    Param dims whose extent does not divide their mesh-axes product fall
    back to replicated (round 5): e.g. UNETR's 3-class output-conv bias
    carries the "embed" -> fsdp axis but a 3-vector cannot shard over
    fsdp=2 — pjit would reject the whole state. Mirrors the divisibility
    guard logical_constraint applies to activations (parallel/mesh.py)."""
    logical = nn.get_partition_spec(state_shapes)
    sharding = nn.logical_to_mesh_sharding(logical, mesh, LOGICAL_RULES)
    return jax.tree.map(
        lambda leaf, sh: _fit_sharding(leaf, sh, mesh),
        unbox(state_shapes), sharding,
    )


def _fit_sharding(shape_leaf, sh, mesh):
    """Apply the shared divisibility rule (mesh.fit_spec_to_shape) to one
    NamedSharding leaf; non-dividing dims fall back to replicated."""
    from ucf_vit_tpu.parallel.mesh import fit_spec_to_shape

    if not isinstance(sh, jax.sharding.NamedSharding):
        return sh
    shape = getattr(shape_leaf, "shape", None)
    if shape is None:
        return sh
    spec = fit_spec_to_shape(shape, tuple(sh.spec), mesh)
    return jax.sharding.NamedSharding(
        sh.mesh, jax.sharding.PartitionSpec(*spec)
    )


def _rebox_opt_state(opt_state, boxed_params):
    """Re-attach Partitioned metadata to optimizer-state subtrees that
    mirror the param tree (Adam mu/nu).

    tx.init runs on unboxed params, so its state carries no logical-axis
    metadata and logical_state_sharding would replicate every moment leaf —
    2x param-size f32 per device, defeating ZeRO-3-style FSDP exactly at the
    model sizes it exists for (the reference's FULL_SHARD shards optimizer
    state too, `train_masked_fsdp.py:384-391`). Boxing the mirrors makes
    the moments inherit their param's sharding."""
    raw_def = jax.tree.structure(unbox(boxed_params))

    def is_params_like(sub):
        try:
            return jax.tree.structure(sub) == raw_def
        except Exception:
            return False

    def rebox(sub):
        if not is_params_like(sub):
            return sub
        return jax.tree.map(
            lambda p, v: p.replace_boxed(v) if isinstance(p, nn.Partitioned) else v,
            boxed_params,
            sub,
            is_leaf=lambda x: isinstance(x, nn.Partitioned),
        )

    return jax.tree.map(rebox, opt_state, is_leaf=is_params_like)


def offload_opt_sharding(opt_sharding):
    """Move an opt-state sharding pytree to pinned host memory.

    STUDY ARTIFACT — measured and rejected as a product knob (BASELINE.md
    round 3): streaming AdamW's mu/nu from pinned host through an in-jit
    roundtrip is numerically exact, but XLA's buffer assignment keeps BOTH
    moment copies live across the transfers, so peak HBM goes UP (+0.9 GiB
    at ViT-L) while the step pays the full PCIe cost (+148%). The
    compute_on('device_host') formulation (moments never leave the host)
    crashes this rig's remote TPU compiler and hangs the CPU backend. Kept
    in-tree with tests (tests/test_offload.py) and the measurement script
    (benchmarks/bench_offload.py) so the rejection is reproducible; not
    reachable from the trainer config."""
    return jax.tree.map(
        lambda s: s.with_memory_kind("pinned_host"), opt_sharding
    )


def create_sharded_train_state(
    init_fn: Callable[[], Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    use_grad_scaler: bool = False,
    init_scale: float = 8192.0,
    ema: bool = False,
    offload_opt: bool = False,
) -> Tuple[TrainState, Any]:
    """Initialize params + optimizer state directly sharded on the mesh.

    init_fn: zero-arg closure returning the flax variables dict (with
    Partitioned metadata). Runs under jit with GSPMD out-shardings so no
    single device ever materializes the full replicated model.

    Returns (state, state_sharding).
    """

    def make_state():
        variables = init_fn()
        params = variables["params"]
        opt_state = tx.init(unbox(params))
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            loss_scale=init_loss_scale(init_scale) if use_grad_scaler else None,
            # boxed copy so EMA leaves inherit the params' logical shardings
            ema_params=params if ema else None,
        )

    state_shapes = jax.eval_shape(make_state)
    state_shapes = state_shapes.replace(
        opt_state=_rebox_opt_state(state_shapes.opt_state, state_shapes.params)
    )
    state_sharding = logical_state_sharding(state_shapes, mesh)

    with mesh:
        state = jax.jit(make_state, out_shardings=state_sharding)()
    if offload_opt:
        # Move the moments to pinned host AFTER the jitted init: jit
        # out_shardings with a host memory kind needs the
        # annotate_device_placement custom call, which the CPU test backend
        # lacks — a plain transfer works everywhere. The transient HBM cost
        # is the zero-initialized moments (2x params), before any batch or
        # activation exists.
        host_sharding = offload_opt_sharding(state_sharding.opt_state)
        state = state.replace(
            opt_state=jax.device_put(state.opt_state, host_sharding)
        )
        state_sharding = state_sharding.replace(opt_state=host_sharding)
    # Drop metadata boxes after placement; shardings now live on the arrays.
    state = state.replace(
        params=unbox(state.params), ema_params=unbox(state.ema_params)
    )
    state_sharding = state_sharding.replace(
        params=unbox(state_sharding.params),
        ema_params=unbox(state_sharding.ema_params),
    )
    return state, state_sharding


def create_sharded_params(init_fn: Callable[[], Any], mesh: Mesh):
    """Params-only sibling of create_sharded_train_state for inference:
    initialize directly sharded on the mesh per LOGICAL_RULES (tp/fsdp
    weight sharding included), no optimizer state.

    Returns (params, params_sharding), both metadata-unboxed."""
    def make_params():
        return init_fn()["params"]

    shapes = jax.eval_shape(make_params)
    sharding = nn.logical_to_mesh_sharding(
        nn.get_partition_spec(shapes), mesh, LOGICAL_RULES
    )
    # same divisibility fallback the training path applies (a 3-class
    # UNETR out-conv bias cannot shard its 'embed' axis over fsdp=2)
    sharding = jax.tree.map(
        lambda leaf, sh: _fit_sharding(leaf, sh, mesh),
        unbox(shapes), sharding,
    )
    with mesh:
        params = jax.jit(make_params, out_shardings=sharding)()
    return unbox(params), unbox(sharding)


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
    accum_steps: int = 1,
    ema_decay: Optional[float] = None,
    offload_opt: bool = False,
):
    """Build a jitted train step.

    loss_fn(params, batch, rng) -> scalar loss (or (loss, aux)).
    Sharding is carried by the data: state comes from
    create_sharded_train_state (params committed on the mesh) and batches
    from mesh.shard_batch, so jit compiles one SPMD program with XLA
    inserting all collectives — no in/out_shardings bookkeeping needed.

    accum_steps > 1 splits the batch into microbatches under lax.scan and
    accumulates gradients before one optimizer update — keeps each
    microbatch at the chip's throughput sweet spot for large global batches
    (measured on v5e: XLA internally chunks batches >= 56 with poor
    pipelining) and bounds activation memory.
    """
    def grads_and_loss(params, batch, rng, scale):
        def scaled_loss(params):
            out = loss_fn(params, batch, rng)
            loss, aux = out if isinstance(out, tuple) else (out, None)
            scaled = loss * scale if scale is not None else loss
            return scaled, (loss, aux)

        return jax.grad(scaled_loss, has_aux=True)(params)

    def accum_grads(params, batch, rng, scale):
        if accum_steps == 1:
            return grads_and_loss(params, batch, rng, scale)

        def to_micro(x):
            assert x.shape[0] % accum_steps == 0, (
                f"batch dim {x.shape[0]} not divisible by accum_steps "
                f"{accum_steps} — samples would be silently dropped"
            )
            return x.reshape(
                (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]
            )

        micro = jax.tree.map(to_micro, batch)
        rngs = jax.random.split(rng, accum_steps)

        def body(carry, xs):
            g_acc, loss_acc = carry
            mb, r = xs
            g, (loss, aux) = grads_and_loss(params, mb, r, scale)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, loss_acc + loss), aux

        g0 = jax.tree.map(lambda t: jnp.zeros_like(t), params)
        (g, loss_sum), auxs = jax.lax.scan(body, (g0, 0.0), (micro, rngs))
        g = jax.tree.map(lambda t: t / accum_steps, g)
        aux = (
            jax.tree.map(lambda a: jnp.mean(a, axis=0), auxs)
            if auxs is not None
            else None
        )
        return g, (loss_sum / accum_steps, aux)

    def ema_update(old_ema, new_params):
        if ema_decay is None or old_ema is None:
            return old_ema
        d = ema_decay
        return jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, old_ema, new_params
        )

    def step_fn(state: TrainState, batch, rng):
        scale = state.loss_scale.scale if state.loss_scale is not None else None
        grads, (loss, aux) = accum_grads(state.params, batch, rng, scale)

        # optimizer-state host offload (study artifact, see
        # offload_opt_sharding): moments live in pinned host between steps;
        # stream them on-device for the update and back after.
        opt_state = state.opt_state
        if offload_opt:
            opt_state = jax.device_put(opt_state, jax.memory.Space.Device)

        if state.loss_scale is not None:
            inv = 1.0 / state.loss_scale.scale
            grads = jax.tree.map(lambda g: g * inv, grads)
            finite = all_finite(grads)
            new_scale = update_loss_scale(state.loss_scale, finite)
            updates, new_opt = tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # Skip the whole update on overflow (GradScaler.step behavior):
            # every optimizer-state leaf mirrors a param leaf or is a scalar
            # counter, so a leafwise select is exact. Merge against the
            # on-device copy — host-resident operands cannot feed compute.
            merge = lambda new, old: jnp.where(finite, new, old)
            new_params = jax.tree.map(merge, new_params, state.params)
            new_opt = jax.tree.map(merge, new_opt, opt_state)
            new_ema = jax.tree.map(
                merge, ema_update(state.ema_params, new_params),
                state.ema_params,
            )  # overflow skips the EMA tick too (params did not move)
            if offload_opt:
                new_opt = jax.device_put(new_opt, jax.memory.Space.Host)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                loss_scale=new_scale,
                ema_params=new_ema,
            )
        else:
            updates, new_opt = tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if offload_opt:
                new_opt = jax.device_put(new_opt, jax.memory.Space.Host)
            new_state = state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                ema_params=ema_update(state.ema_params, new_params),
            )
        return new_state, loss, aux

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
