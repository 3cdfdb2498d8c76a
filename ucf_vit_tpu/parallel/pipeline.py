"""GPipe-style pipeline parallelism over a 'pp' mesh axis.

Capability-plus over the reference, which has no pipeline parallelism at all
(SURVEY §2.5: "PP / EP / CP — absent entirely"; its parallelism surface is
DDP x FSDP x TP, `src/UCF_VIT/utils/misc.py:129-238`). PP is how transformer
depth scales past one chip's HBM once FSDP gather bandwidth becomes the
bottleneck — the regime the reference's README gestures at ("hundreds of
billions of parameters") without a mechanism.

TPU-native formulation (no NCCL groups, no per-stage processes):

- The transformer stack's parameters are already stacked [depth, ...] by
  `scan_layers` (nn.scan with PARTITION_NAME "layers"); the logical rule
  ("layers", "pp") shards that leading axis over the pipeline stages, so
  each stage's weights LIVE on its devices — there is no weight movement.
- The schedule runs inside one `jax.shard_map` that is manual over ONLY the
  'pp' axis (`axis_names={"pp"}`): data/tensor axes stay in GSPMD "auto"
  mode, so pp composes with ddp/fsdp sharding without any code here knowing
  about them.
- Stage-to-stage activation transfer is a single `lax.ppermute` per tick —
  the neighbor-only collective the hardware's ICI torus is best at.
- The whole schedule is a `lax.scan` over ticks (static trip count
  M + S - 1), so it traces once and XLA pipelines the permutes against the
  stage compute. jax's varying-mesh-axes tracking differentiates through
  the schedule, giving the standard GPipe backward (reverse tick order)
  with per-tick rematerialization via `jax.checkpoint`.

Bubble accounting: each of the S stages is idle for (S-1) of the
(M + S - 1) ticks, so utilization = M / (M + S - 1). Raise
`pipe_microbatches` to amortize (GPipe's M >> S rule).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ucf_vit_tpu.parallel.mesh import AXIS_PP, AXIS_SP, DATA_AXES


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _enter_varying(x, axis: str):
    """pp-invariant -> pp-varying entry point with a bf16-safe transpose.

    The transpose of `pcast(to="varying")` is a psum_invariant of the
    cotangent over pp. jax's shardy lowering roots that reducer with a
    Sharding custom-call which the SPMD partitioner rewrites to a `copy`;
    XLA's bf16 float-normalization then rebuilds the reducer from the root
    opcode and CHECK-fails on kCopy ("Invalid binary instruction opcode
    copy"). Round 4 dodged this by keeping every schedule-held buffer f32 —
    2x bytes on the full input and its saved-for-backward copies. This
    custom VJP keeps the buffers in the model dtype and pays f32 only
    transiently inside the backward collective: cast the cotangent up, psum
    in f32 (never bf16-reduced, so never rewritten), cast back down.
    (tests/test_parallel_pp.py::test_pp_bf16_compiles guards the crash;
    the grads==no-pp tests guard the numerics.)"""
    return lax.pcast(x, (axis,), to="varying")


def _enter_varying_fwd(x, axis):
    return _enter_varying(x, axis), None


def _enter_varying_bwd(axis, _, g):
    g32 = lax.psum(g.astype(jnp.float32), axis)
    return (g32.astype(g.dtype),)


_enter_varying.defvjp(_enter_varying_fwd, _enter_varying_bwd)


def _batch_group(mesh, mb: int) -> tuple:
    """Largest subset of the data axes (ddp, ep, fsdp) whose extent divides
    the per-microbatch batch `mb` — the axes the schedule lays each
    microbatch's batch dim over. When mb is smaller than the full data
    extent (more data shards than samples per microbatch) the leftover axes
    replicate — the schedule is honest about that waste; pick_microbatches
    avoids it when the count is not forced."""
    best: tuple = ()
    best_ext = 1
    n_ax = len(DATA_AXES)
    for bits in range(1, 1 << n_ax):
        grp = tuple(a for i, a in enumerate(DATA_AXES) if bits >> i & 1)
        ext = 1
        for a in grp:
            ext *= mesh.shape[a]
        if ext > best_ext and mb % ext == 0:
            best, best_ext = grp, ext
    return best


def pick_microbatches(
    batch: int, pp_size: int, requested: int = 0, data_extent: int = 1
) -> int:
    """Microbatch count for the schedule. Explicit `requested` wins (must
    divide the batch); otherwise the largest divisor of `batch` that is
    <= 4 * pp_size (bubble fraction <= (S-1)/(4S) ~ 20%) AND — among those —
    keeps each microbatch divisible by `data_extent` (the ddp x ep x fsdp
    shard count), so every data shard holds at least one sample per tick
    and no stage compute is replicated. If no divisor satisfies both, the
    bubble bound wins (a tiny batch on a wide mesh replicates instead)."""
    if requested > 0:
        assert batch % requested == 0, (
            f"pipe_microbatches {requested} does not divide batch {batch}"
        )
        return requested
    best = 1
    best_aligned = 0
    for m in range(1, min(batch, 4 * pp_size) + 1):
        if batch % m == 0:
            best = m
            if (batch // m) % max(data_extent, 1) == 0:
                best_aligned = m
    return best_aligned or best


def pipeline_blocks(
    apply_layer: Callable,
    stacked_params,
    x: jnp.ndarray,
    *,
    mesh,
    pp_size: int,
    num_microbatches: int = 0,
    axis: str = AXIS_PP,
    take_indices: tuple = (),
):
    """Run a stacked layer sequence as a GPipe pipeline over `axis`.

    apply_layer(layer_params, x) -> x  OR  (x, aux_scalar): ONE block, pure
    (dropout-free). A returned aux scalar (MoE load-balance loss) is
    accumulated over layers and microbatches and returned as its MEAN — the
    per-microbatch average, i.e. gradient-accumulation semantics for the
    auxiliary objective.
    stacked_params: pytree whose leaves have leading axis `depth`
        (depth % pp_size == 0); sharded (or shardable) over `axis` on dim 0.
    x: [B, ...] activations, replicated over `axis` (other mesh axes free).

    take_indices: global block indices whose OUTPUTS are additionally
    returned (UNETR skip connections, `simple/arch.py:995-1086`). Each tap
    is written by its owning stage into a zero-initialized [M, K, ...]
    buffer and delivered by the same end-of-schedule psum that publishes
    the last stage's outputs — no extra ppermute traffic, K x microbatch
    activation memory. Returns (y, taps [K, B, ...]) when non-empty.
    """
    assert mesh is not None and axis in mesh.axis_names, (
        f"pipe_par_size > 1 needs a mesh with a '{axis}' axis — build it via "
        f"parallel.mesh.make_mesh(pipe_par_size=...)"
    )
    s_mesh = mesh.shape[axis]
    assert s_mesh == pp_size, (
        f"mesh '{axis}' size {s_mesh} != model pipe_par_size {pp_size}"
    )
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % pp_size == 0, (
        f"depth {depth} not divisible by pipe_par_size {pp_size}"
    )
    b = x.shape[0]
    data_ext = 1
    for a in DATA_AXES:
        data_ext *= mesh.shape[a]
    m = pick_microbatches(b, pp_size, num_microbatches, data_ext)
    s = pp_size
    l_local = depth // s
    k_taps = len(take_indices)
    assert all(0 <= i < depth for i in take_indices), (
        f"take_indices {take_indices} out of range for depth {depth}"
    )
    # STRIDED microbatch split: microbatch j = samples {i*m + j}. The batch
    # arrives dim-0-sharded over the data axes; a contiguous [B] -> [M, B/M]
    # split would put each microbatch's samples on ONE data shard, so every
    # tick either reshards (the partitioner falls back to a full
    # rematerialization) or computes on 1/data_ext of the devices. Reshaping
    # batch-major and swapping instead keeps every sample on its home
    # device — each data shard contributes B/(M*data_ext) samples to EVERY
    # microbatch and the swap is sharding-local (no collective). Grouping is
    # semantically free: all per-sample math is grouping-invariant and MoE
    # capacity is per-sample (models/moe.py). The inverse swap below puts
    # outputs back in input order.
    xm = jnp.swapaxes(x.reshape((b // m, m) + x.shape[1:]), 0, 1)
    # Every schedule-held buffer stays in the model dtype. bf16 values still
    # must not reach a psum REDUCER (the XLA bf16-normalization CHECK-fail,
    # see _enter_varying): the invariant->varying entry runs through the
    # custom VJP above (f32 only transiently inside its backward psum), and
    # the end-of-schedule publishing psums cast f32 around the collective
    # (_psum_f32). Round 4 instead held the full input f32 for the whole
    # schedule — 2x bytes on exactly the largest tensors (measured on
    # vit_l_pp: tools/memory_report.py, BASELINE.md round-5 pp-memory row).
    io_dtype = xm.dtype
    # One explicit layout for every schedule-held activation, inside and
    # out: microbatch-INDEX dims replicated, the batch dim over the largest
    # dividing data-axes subset, seq over sp. Without this the batch enters
    # dim-0-sharded from its [B] -> [M, B/M] reshape, the per-tick
    # `dynamic_index_in_dim` slices across that sharded dim, and GSPMD's
    # only remaining move is an involuntary full rematerialization
    # (all-gather + re-partition) of the whole input every step; the
    # backward's cotangent buffers invent their own layouts the same way.
    grp = _batch_group(mesh, b // m)
    n_seq = x.shape[1] if x.ndim >= 3 else 0
    sp_grp = (
        AXIS_SP
        if n_seq and mesh.shape[AXIS_SP] > 1 and n_seq % mesh.shape[AXIS_SP] == 0
        else None
    )

    def _sched_spec(v, lead: int) -> P:
        # [*(lead index dims), B, N, D...] -> (None..., grp, sp, None...)
        tail = v.ndim - lead - 1
        dims: list = [None] * lead + [grp if grp else None]
        if tail >= 2:
            dims += [sp_grp] + [None] * (tail - 1)
        else:
            dims += [None] * tail
        return P(*dims)

    xm = lax.with_sharding_constraint(
        xm, jax.sharding.NamedSharding(mesh, _sched_spec(xm, 1))
    )

    def _psum_f32(v):
        return lax.psum(v.astype(jnp.float32), axis).astype(v.dtype)

    def schedule(local_params, xm):
        # the invariant input enters the varying world ONCE, through the
        # bf16-safe custom-VJP boundary (see _enter_varying)
        xm = _enter_varying(xm, axis)
        stage = lax.axis_index(axis)
        ticks = m + s - 1

        def _c(v, lead: int):
            # pin the schedule layout (bare spec: manual over pp, the spec
            # names only still-auto axes) so neither the forward loop nor
            # its transposed cotangent loop invents a conflicting one
            return lax.with_sharding_constraint(v, _sched_spec(v, lead))

        def stage_apply(xi):
            def body(c, p):
                out = apply_layer(p, c)
                c, a = out if isinstance(out, tuple) else (out, jnp.float32(0))
                return c, (c, a)

            c, (ys, auxs) = lax.scan(body, xi, local_params)
            # ys: per-layer outputs [l_local, ...]; auxs summed over layers
            return c, ys, jnp.sum(auxs)

        # carries start stage-invariant (zeros) but become stage-varying:
        # declare that to jax's varying-mesh-axes tracking up front, through
        # the same bf16-safe boundary as the input.
        def _varying_zeros(shape):
            return _enter_varying(jnp.zeros(shape, io_dtype), axis)

        buf = _c(_varying_zeros(xm.shape), 1)
        carry = _c(_varying_zeros(xm.shape[1:]), 0)
        taps_buf = _c(_varying_zeros((m, k_taps) + xm.shape[1:]), 2)
        # (shapes only — dtypes come from io_dtype inside _varying_zeros)
        aux_acc = lax.pcast(jnp.float32(0.0), (axis,), to="varying")

        def tick(state, t):
            carry, buf, taps_buf, aux_acc = state
            mb = t - stage  # microbatch this stage works on (may be bubble)
            inp0 = lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            x_in = _c(jnp.where(stage == 0, inp0, carry), 0)
            y, ys, aux = jax.checkpoint(stage_apply)(x_in)
            nxt = _c(
                lax.ppermute(y, axis, [(i, i + 1) for i in range(s - 1)]), 0
            )
            in_flight = (mb >= 0) & (mb < m)
            valid = in_flight & (stage == s - 1)
            wi = jnp.clip(mb, 0, m - 1)
            cur = lax.dynamic_index_in_dim(buf, wi, 0, keepdims=False)
            buf = _c(
                lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, y, cur), wi, 0
                ),
                1,
            )
            aux_acc = aux_acc + jnp.where(in_flight, aux, 0.0)
            for kk, gidx in enumerate(take_indices):
                # the stage owning global block gidx writes its output for
                # this microbatch; every other stage's slot stays zero
                s_k, j_k = divmod(gidx, l_local)
                ok = in_flight & (stage == s_k)
                cur_t = taps_buf[wi, kk]
                taps_buf = _c(
                    taps_buf.at[wi, kk].set(jnp.where(ok, ys[j_k], cur_t)), 2
                )
            return (carry if s == 1 else nxt, buf, taps_buf, aux_acc), None

        (carry, buf, taps_buf, aux_acc), _ = lax.scan(
            tick, (carry, buf, taps_buf, aux_acc), jnp.arange(ticks)
        )
        # only the last stage holds real outputs; make them stage-replicated.
        # taps_buf needs no mask: non-owning stages never wrote their slots.
        out = _c(
            _psum_f32(jnp.where(stage == s - 1, buf, jnp.zeros_like(buf))), 1
        )
        # mean over (layers, microbatches): every (stage, in-flight tick)
        # pair contributed one summed-over-l_local aux
        aux_mean = lax.psum(aux_acc, axis) / float(depth * m)
        return out, _c(_psum_f32(taps_buf), 2), aux_mean

    from ucf_vit_tpu.ops.attention import local_attention_only
    from ucf_vit_tpu.parallel.mesh import manual_region_constraints

    # the body is a manual-over-pp region: attention inside must use its
    # direct (per-shard) paths, not its own full-mesh shard_map wrapper;
    # activation logical_constraints switch to bare-PartitionSpec emission
    # over the still-auto data/tensor axes (mesh.logical_constraint)
    with local_attention_only(), manual_region_constraints():
        ym, taps, aux = jax.shard_map(
            schedule,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=(P(), P(), P()),
            axis_names={axis},
        )(stacked_params, xm)
    # invert the strided split: [m(j), b/m(i), ...] -> [i, j, ...] -> [b]
    y = jnp.swapaxes(ym, 0, 1).reshape(x.shape)
    if k_taps:
        # [m(j), K, b/m(i), ...] -> [K, i, j, ...] -> [K, b, ...]
        taps = jnp.moveaxis(taps, 1, 0)  # [K, m, b/m, ...]
        taps = jnp.swapaxes(taps, 1, 2).reshape((k_taps, b) + x.shape[1:])
    else:
        taps = None
    return y, taps, aux
