"""Attention implementation dispatch.

TPU-native analogue of the reference's FusedAttn enum
(`src/UCF_VIT/utils/fused_attn.py` + dispatch in
`simple/building_blocks.py:163-187`):

    reference FLASH / CK (xformers CUDA / ROCm kernels)  ->  AttnImpl.FLASH
        (one Pallas kernel covers both vendor paths)
    reference DEFAULT (torch SDPA)                        ->  AttnImpl.XLA
        (jax.nn.dot_product_attention — XLA-fused softmax attention)
    reference NONE (pure einsum)                          ->  AttnImpl.EINSUM
        (kept as the numerics oracle for kernel tests)

All impls take/return [B, H, N, dh] and are numerically interchangeable
(tested to <=1e-3 in bf16, <=1e-5 in f32).
"""

from __future__ import annotations

import contextlib
import enum
import functools
import threading

import jax
import jax.numpy as jnp

from ucf_vit_tpu.ops.flash_attention import flash_attention


class AttnImpl(str, enum.Enum):
    FLASH = "FLASH"  # Pallas flash-attention kernel (TPU, long sequences)
    XLA = "XLA"  # jax.nn.dot_product_attention (XLA-fused)
    EINSUM = "EINSUM"  # plain jnp reference path (numerics oracle)
    AUTO = "AUTO"  # shape-aware: EINSUM short / FLASH long on TPU, XLA elsewhere

    @classmethod
    def from_string(cls, s: str) -> "AttnImpl":
        s = s.upper()
        # Accept the reference's FusedAttn spellings for config compat.
        # "SHORT" was a Pallas short-sequence kernel: built, measured slower
        # in-stack than the einsum fusion (see SHORT_SEQ_THRESHOLD note),
        # deleted; the alias keeps old configs working.
        aliases = {"CK": "FLASH", "DEFAULT": "XLA", "NONE": "EINSUM", "SHORT": "EINSUM"}
        return cls(aliases.get(s, s))


@functools.lru_cache(maxsize=1)
def _default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Below this many KV tokens the fully-materialized einsum fusion beats every
# Pallas kernel we tried on TPU, because XLA fuses the softmax into the
# surrounding matmuls and overlaps across ops, which an opaque pallas_call
# cannot join. Measured on v5e at the MAE-decoder shape [24,16,256,32]
# fwd+bwd: einsum 934 us/layer isolated but ~612 us in-stack; a VMEM-resident
# fused kernel with saved probs hit 665 us isolated yet LOST in-stack (MAE
# step 1031 vs 1155 img/s) — so an AttnImpl.SHORT kernel was built, measured,
# and deleted. Flash wins above this threshold, where the score matrix
# spills VMEM and XLA materializes it in HBM (1.05 GB/layer measured).
SHORT_SEQ_THRESHOLD = 1024

# Sequence-parallel attention strategies under sp > 1 (config key
# `parallelism.sp_mode`, threaded per-call as the `sp_mode` argument — it
# rides the model object like attn_impl, so a trainer and a server with
# different strategies coexist in one process; round 5 removed the former
# process-global):
#   "auto":    Ulysses a2a when local heads divide by sp, else KV-gather.
#   "ulysses": force the a2a head<->seq swap (errors if heads don't divide).
#   "ring":    ring attention (rotating KV chunks, O(N/sp) memory per chip
#              in both directions — custom VJP recomputes chunk probs).
#   "gather":  all-gather K/V along sp, queries stay sharded (O(N) keys).
SP_MODES = ("auto", "ulysses", "ring", "gather")


def resolve_impl(impl: AttnImpl | str, n_kv: int | None = None) -> AttnImpl:
    if isinstance(impl, str):
        impl = AttnImpl.from_string(impl)
    if impl == AttnImpl.AUTO:
        if not _default_backend_is_tpu():
            return AttnImpl.XLA
        if n_kv is not None and n_kv <= SHORT_SEQ_THRESHOLD:
            return AttnImpl.EINSUM
        return AttnImpl.FLASH
    return impl


@functools.lru_cache(maxsize=1)
def _warn_interpret_once() -> None:
    import warnings

    warnings.warn(
        "AttnImpl.FLASH requested on a non-TPU, non-CPU backend: the Pallas "
        "TPU kernel runs in interpret mode here (very slow). Use "
        "AttnImpl.XLA or AUTO on this backend.",
        RuntimeWarning,
        stacklevel=3,
    )


def einsum_attention(
    q, k, v, *, sm_scale: float, seg_len: int | None = None,
    dropout_rate: float = 0.0, dropout_rng=None,
) -> jnp.ndarray:
    """Reference attention: full score matrix, f32 softmax. [B,H,N,dh].

    seg_len: block-diagonal masking for sequence-packed batches (tokens only
    attend within their own seg_len-sized segment). Used by MAE sequence
    packing (several samples' kept tokens folded into one sequence) — the
    mask makes the packed result bit-equivalent to per-sample attention.

    dropout_rate/dropout_rng: attention-probability dropout (torch SDPA
    `dropout_p` semantics — drop post-softmax probabilities with rate p and
    rescale survivors by 1/(1-p)). Parity: the reference threads `attn_drop`
    into every attention branch, `simple/building_blocks.py:163-187`.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q * sm_scale, k).astype(jnp.float32)
    if seg_len is not None:
        n_q, n_kv = s.shape[-2], s.shape[-1]
        seg_q = jnp.arange(n_q, dtype=jnp.int32) // seg_len
        seg_k = jnp.arange(n_kv, dtype=jnp.int32) // seg_len
        same = seg_q[:, None] == seg_k[None, :]
        s = jnp.where(same, s, -0.7 * jnp.finfo(jnp.float32).max)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    if dropout_rate > 0.0:
        assert dropout_rng is not None, (
            "attention dropout_rate > 0 requires a dropout_rng"
        )
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, p.shape)
        p = jnp.where(mask, p / keep, jnp.zeros_like(p))
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _active_mesh():
    """The Mesh we are tracing under, or None. Primary source: the
    framework's own mesh_context contextvar (parallel/mesh.py) — the same
    switch that arms activation logical_constraints; the legacy
    thread_resources probe remains as a fallback for code running under a
    bare `with mesh:`."""
    from ucf_vit_tpu.parallel.mesh import active_mesh

    m = active_mesh()
    if m is not None:
        return m
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:  # pragma: no cover
        return None


_LOCAL_ONLY = threading.local()


def _local_only() -> bool:
    return getattr(_LOCAL_ONLY, "flag", False)


@contextlib.contextmanager
def local_attention_only():
    """Force per-shard (non-shard_map) attention while tracing code that is
    ALREADY inside a manual region — e.g. the pipeline-parallel schedule
    (`parallel/pipeline.py`), where a nested shard_map over the full mesh
    would be rejected. The direct Pallas kernel is legal inside shard_map;
    only the wrapper's own shard_map is not."""
    prev = _local_only()
    _LOCAL_ONLY.flag = True
    try:
        yield
    finally:
        _LOCAL_ONLY.flag = prev


def _sharded_flash(
    q, k, v, sm_scale, mesh, interpret=False, sp_mode="auto",
    dropout_rate=0.0, dropout_seed=None,
):
    """Flash attention under a mesh via shard_map.

    GSPMD cannot partition a pallas_call, so the kernel is wrapped in
    shard_map with the activation layout the models establish
    ([B, H, N, dh]: batch over (ddp, fsdp), heads over tp, seq over sp).
    With sp > 1 this IS the sequence-parallel attention (the capability the
    reference declares but never implements — `seq_par_size` asserted ==1,
    `train_masked_fsdp.py:220`): each sp shard holds N/sp query rows and
    all-gathers K/V along sp before the kernel (blockwise KV-gather SP).

    Dropout under sharding: the hash mask is a function of (seed, bh, row,
    col) in each shard's local frame, so shard indices that relabel the
    SAME coordinates (batch over ddp/fsdp, heads over tp or the Ulysses
    sp-split) are folded into the seed, while strategies where shards cover
    DISJOINT global coordinates present those coordinates instead (KV-gather
    passes its global row offset; ring passes global offsets per chunk and
    keeps one seed across sp so the union of shard masks is a single global
    Bernoulli draw)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ucf_vit_tpu.ops.attn_dropout import fold_seed

    names = set(mesh.axis_names)
    batch_axes = tuple(a for a in ("ddp", "fsdp") if a in names) or None
    tp = "tp" if "tp" in names else None
    sp = "sp" if "sp" in names and mesh.shape.get("sp", 1) > 1 else None

    q_spec = P(batch_axes, tp, sp, None)
    kv_spec = P(batch_axes, tp, sp, None)
    out_spec = P(batch_axes, tp, sp, None)

    sp_size = mesh.shape.get("sp", 1) if sp else 1
    tp_size = mesh.shape.get("tp", 1) if tp else 1
    local_heads = q.shape[1] // tp_size
    divisible = local_heads % sp_size == 0
    assert sp_mode in SP_MODES, f"sp_mode {sp_mode!r} not in {SP_MODES}"
    if sp_mode == "ulysses":
        assert divisible, (
            f"sp_mode=ulysses needs local heads ({local_heads}) divisible by "
            f"seq_par_size ({sp_size}); use sp_mode=ring or auto"
        )
    use_ulysses = (
        sp is not None
        and sp_mode in ("auto", "ulysses")
        and divisible
    )
    dropping = dropout_rate > 0.0

    def local_attn(q, k, v):
        seed = dropout_seed
        if dropping:
            # replica-relabeled coordinates -> decorrelate via the seed
            bh_axes = [a for a in ((batch_axes or ()) + ((tp,) if tp else ()))]
            if bh_axes:
                seed = fold_seed(
                    seed, *[jax.lax.axis_index(a) for a in bh_axes]
                )
        if sp is None:
            return flash_attention(
                q, k, v, sm_scale=sm_scale, dropout_rate=dropout_rate,
                dropout_seed=seed, interpret=interpret,
            )
        if sp_mode == "ring":
            from ucf_vit_tpu.ops.ring_attention import ring_attention

            return ring_attention(
                q, k, v, sp, sm_scale,
                dropout_rate=dropout_rate, dropout_seed=seed,
            )
        if use_ulysses:
            # Ulysses SP: a2a swaps head-sharding for seq-sharding, so each
            # shard computes full-sequence attention on H/(tp*sp) heads —
            # no KV duplication (DeepSpeed-Ulysses; the pattern the
            # reference's unused a2a collectives were staged for,
            # `dist_functions.py:617-677`).
            if dropping:
                # after the a2a each sp shard owns a disjoint head subset
                seed = fold_seed(seed, jax.lax.axis_index(sp))
            q = jax.lax.all_to_all(q, sp, split_axis=1, concat_axis=2, tiled=True)
            k = jax.lax.all_to_all(k, sp, split_axis=1, concat_axis=2, tiled=True)
            v = jax.lax.all_to_all(v, sp, split_axis=1, concat_axis=2, tiled=True)
            o = flash_attention(
                q, k, v, sm_scale=sm_scale, dropout_rate=dropout_rate,
                dropout_seed=seed, interpret=interpret,
            )
            return jax.lax.all_to_all(o, sp, split_axis=2, concat_axis=1, tiled=True)
        # fallback: gather K/V along sp, keep queries sharded — each shard
        # owns global query rows [idx*Nq_local, ...), so the mask sees the
        # true row coordinates rather than a folded seed
        row0 = jax.lax.axis_index(sp) * q.shape[2] if dropping else 0
        k = jax.lax.all_gather(k, sp, axis=2, tiled=True)
        v = jax.lax.all_gather(v, sp, axis=2, tiled=True)
        return flash_attention(
            q, k, v, sm_scale=sm_scale, dropout_rate=dropout_rate,
            dropout_seed=seed, dropout_offset=(row0, 0), interpret=interpret,
        )

    return shard_map(
        local_attn,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec),
        out_specs=out_spec,
        check_vma=False,  # pallas_call does not propagate varying-mesh-axes
    )(q, k, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: AttnImpl | str = AttnImpl.AUTO,
    sm_scale: float | None = None,
    interpret: bool = False,
    seg_len: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    sp_mode: str = "auto",
) -> jnp.ndarray:
    """Dispatch scaled-dot-product attention over [B, H, N, dh] inputs.

    seg_len: block-diagonal segment masking for sequence-packed batches
    (see einsum_attention). Supported on the EINSUM and XLA paths; packed
    sequences are short by construction, so AUTO lands on EINSUM.

    dropout_rate: attention-probability dropout (reference `attn_drop`,
    `simple/building_blocks.py:163-187`). Runs INSIDE the Pallas flash
    kernel (hash-mask regeneration, ops/attn_dropout.py) and on the EINSUM
    path (materialized bernoulli mask); the XLA path
    (jax.nn.dot_product_attention) has no dropout parameter, so an explicit
    XLA request with dropout_rate > 0 is a hard error rather than a silent
    no-op, and AUTO resolving to XLA (non-TPU backend) falls back to EINSUM.

    sp_mode: sequence-parallel strategy under an sp>1 mesh (see SP_MODES);
    threaded from the model so concurrent models may differ.
    """
    resolved = resolve_impl(impl, n_kv=k.shape[2])
    if dropout_rate > 0.0:
        explicit = AttnImpl.from_string(impl) if isinstance(impl, str) else impl
        if explicit == AttnImpl.XLA:
            raise ValueError(
                f"attn_drop={dropout_rate} is not supported on the XLA "
                f"attention path (jax.nn.dot_product_attention has no dropout "
                f"parameter). Use attn_impl: AUTO, FLASH, or EINSUM, or set "
                f"attn_drop_rate: 0."
            )
        if resolved == AttnImpl.XLA:
            resolved = AttnImpl.EINSUM
        assert dropout_rng is not None, (
            "attention dropout_rate > 0 requires a dropout_rng"
        )
    impl = resolved
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    # Pallas TPU kernels only compile on TPU; on other backends run them in
    # interpret mode so FLASH stays numerically testable end-to-end without
    # a chip. On anything but the CPU test mesh that is a silent
    # orders-of-magnitude slowdown, so say so once.
    if not _default_backend_is_tpu():
        if not interpret and jax.default_backend() != "cpu":
            _warn_interpret_once()
        interpret = True

    if seg_len is not None and impl == AttnImpl.FLASH:
        # The flash kernel has no segment-mask support. Packed sequences are
        # kept short by construction (MAE asserts seq_pack * len_keep stays
        # under SHORT_SEQ_THRESHOLD), where einsum is the faster path anyway.
        assert k.shape[2] <= SHORT_SEQ_THRESHOLD, (
            f"segment-masked attention over {k.shape[2]} tokens would "
            f"materialize the full score matrix; reduce seq_pack so the "
            f"packed length stays <= {SHORT_SEQ_THRESHOLD}"
        )
        impl = AttnImpl.EINSUM

    if impl == AttnImpl.FLASH:
        seed = None
        if dropout_rate > 0.0:
            from ucf_vit_tpu.ops.attn_dropout import seed_from_key

            seed = seed_from_key(dropout_rng)
        mesh = _active_mesh()
        if (
            mesh is not None
            and len(mesh.devices.flat) > 1
            and not _local_only()
        ):
            return _sharded_flash(
                q, k, v, sm_scale, mesh, interpret, sp_mode,
                dropout_rate, seed,
            )
        return flash_attention(
            q, k, v, sm_scale=sm_scale, dropout_rate=dropout_rate,
            dropout_seed=seed, interpret=interpret,
        )
    if impl == AttnImpl.XLA:
        mask = None
        if seg_len is not None:
            seg_q = jnp.arange(q.shape[2], dtype=jnp.int32) // seg_len
            seg_k = jnp.arange(k.shape[2], dtype=jnp.int32) // seg_len
            mask = (seg_q[:, None] == seg_k[None, :])[None, None]
        # jax.nn.dot_product_attention wants [B, N, H, dh].
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale=sm_scale,
            mask=mask,
        )
        return out.transpose(0, 2, 1, 3)
    return einsum_attention(
        q, k, v, sm_scale=sm_scale, seg_len=seg_len,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )
