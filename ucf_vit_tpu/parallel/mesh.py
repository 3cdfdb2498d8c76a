"""Device mesh + logical sharding rules: the whole parallelism runtime.

TPU-native replacement for the reference's process-group machinery:
- `init_par_groups` building 6 torch.distributed communicators
  (`src/UCF_VIT/utils/misc.py:129-238`) -> ONE `jax.sharding.Mesh` with named
  axes ('ddp', 'fsdp', 'sp', 'tp').
- The hand-written conjugate collectives (`utils/dist_functions.py`) and the
  FSDP wrapper stack (`train_masked_fsdp.py:361-396`) -> GSPMD: logical axis
  names on every parameter (see `models/blocks.py`) are mapped to mesh axes by
  LOGICAL_RULES, and XLA inserts forward/backward collectives automatically.
- The per-step TP batch broadcast (`train_masked_fsdp.py:486-533`) ->
  unnecessary: batches are sharded over ('ddp','fsdp') and replicated over
  'tp' by construction.

Axis semantics (reference parallelism config keys map 1:1):
  pp   — pipe_par_size     (GPipe pipeline stages — capability-plus: the
                            reference has no pipeline parallelism at all)
  ddp  — simple_ddp_size   (replica / HYBRID_SHARD outer axis)
  ep   — expert_par_size   (MoE expert sharding — capability-plus: the
                            reference has no MoE/EP; models/moe.py)
  fsdp — fsdp_size         (parameter-sharding axis, ZeRO-3 style)
  sp   — seq_par_size      (sequence parallelism — real here, asserted ==1 in
                            the reference, `train_masked_fsdp.py:220`)
  tp   — tensor_par_size   (Megatron column/row sharding of qkv/proj/fc1/fc2)

tp is the innermost (fastest-varying) mesh dim so TP collectives ride
neighboring ICI links, matching the reference's contiguous-rank TP groups
(`misc.py:133-142`); pp is outermost — its neighbor-only ppermute is the
lowest-bandwidth collective here and the natural one to cross slice (DCN)
boundaries on multi-slice topologies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_PP = "pp"
AXIS_DDP = "ddp"
AXIS_EP = "ep"
AXIS_FSDP = "fsdp"
AXIS_SP = "sp"
AXIS_TP = "tp"
MESH_AXES = (AXIS_PP, AXIS_DDP, AXIS_EP, AXIS_FSDP, AXIS_SP, AXIS_TP)

# Batch is data-parallel over ddp and fsdp (reference:
# data_par_size = fsdp_size * simple_ddp_size, `train_masked_fsdp.py:219`)
# and additionally over ep: expert parallelism borrows the data dimension
# for everything outside the expert einsums (the MaxText/GShard layout), so
# ep devices are never idle in the dense parts of the model.
DATA_AXES = (AXIS_DDP, AXIS_EP, AXIS_FSDP)

# Logical axis name -> mesh axis (None = replicated). These names are attached
# to params via nn.with_partitioning in models/blocks.py and to activations
# via nn.with_logical_constraint.
LOGICAL_RULES = (
    # activations
    ("batch", DATA_AXES),
    ("seq", AXIS_SP),
    ("heads", AXIS_TP),
    # conv feature maps: first spatial dim of [B, *spatial, C] decoder
    # activations rides the SAME sp axis the token sequence does — for
    # UNETR the sequence [B, L, D] resharding into the grid [B, s, s(, s), D]
    # keeps its leading-dim split, and the conv decoder runs spatially
    # partitioned with GSPMD-inserted halo exchanges (models/unetr.py)
    ("spatial", AXIS_SP),
    # parameters
    ("layers", AXIS_PP),  # scan-stacked Block params: one stage per pp rank
    ("embed", AXIS_FSDP),  # ZeRO-3-style param sharding on the fsdp axis
    ("mlp", AXIS_TP),  # fc1 column-parallel (fsdp/building_blocks.py:123)
    ("qkv", AXIS_TP),  # qkv column-parallel (fsdp/building_blocks.py:169)
    ("tp_in", AXIS_TP),  # proj/fc2 row-parallel (fsdp/building_blocks.py:127,173)
    # MoE (capability-plus; models/moe.py): stacked expert weights shard
    # their leading E axis over ep; dispatched activations keep E on ep and
    # their token-batch on the non-ep data axes, which makes GSPMD lower the
    # dispatch/combine einsums to the canonical a2a pair over ep.
    ("expert", AXIS_EP),
    ("expert_batch", (AXIS_DDP, AXIS_FSDP)),
    ("dec_embed", None),
    ("embed_out", None),
    ("classes", None),
)


def make_mesh(
    simple_ddp_size: int = 1,
    fsdp_size: int = 1,
    seq_par_size: int = 1,
    tensor_par_size: int = 1,
    pipe_par_size: int = 1,
    expert_par_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 6-axis mesh from the reference parallelism config keys."""
    if devices is None:
        devices = jax.devices()
    world = (
        pipe_par_size
        * simple_ddp_size
        * expert_par_size
        * fsdp_size
        * seq_par_size
        * tensor_par_size
    )
    if world < len(devices):
        # a smaller-than-host config (e.g. a 1-device smoke run on an
        # 8-device host) uses the first `world` devices
        devices = devices[:world]
    assert world == len(devices), (
        f"world size {world} (= pp {pipe_par_size} x ddp {simple_ddp_size} x "
        f"ep {expert_par_size} x fsdp {fsdp_size} x sp {seq_par_size} x "
        f"tp {tensor_par_size}) != #devices {len(devices)}"
    )
    shape = (
        pipe_par_size,
        simple_ddp_size,
        expert_par_size,
        fsdp_size,
        seq_par_size,
        tensor_par_size,
    )
    arr = _assign_devices(shape, list(devices))
    return Mesh(arr, MESH_AXES)


def _dcn_factorization(shape: Sequence[int], num_slices: int):
    """Split each global axis size into (across-DCN, within-slice) factors.

    Greedy from the OUTERMOST axis in (pp, ddp, ep, fsdp, sp, tp): pp's
    neighbor-only ppermute and ddp's once-per-step gradient all-reduce are
    the collectives that tolerate DCN latency, while fsdp/sp/tp per-layer
    collectives must stay on ICI. Returns (dcn_shape, per_slice_shape) or
    None if num_slices does not factor into the outer axes.
    """
    import math

    dcn, per_slice, remaining = [], [], num_slices
    for size in shape:
        f = math.gcd(size, remaining)
        dcn.append(f)
        per_slice.append(size // f)
        remaining //= f
    if remaining != 1:
        return None
    return tuple(dcn), tuple(per_slice)


def _assign_devices(shape: Sequence[int], devices: list) -> np.ndarray:
    """Lay the devices out on `shape` with the best physical assignment.

    - Multi-slice TPU (devices carry distinct `slice_index`es): hybrid
      ICI+DCN mesh — outer axes (pp, then ddp, ...) span slices over DCN,
      inner axes stay within a slice on ICI.
    - Single slice: `mesh_utils.create_device_mesh`, which searches the
      physical torus for an assignment where each mesh dim rides contiguous
      ICI rings (raw `jax.devices()` order gives tp nearest-neighbor links
      only by accident of device numbering).
    - Anything it cannot handle (CPU meshes, partial-host device subsets):
      row-major reshape, which is exactly the virtual-device test layout.
    """
    from jax.experimental import mesh_utils

    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        fact = _dcn_factorization(shape, len(slice_ids))
        assert fact is not None, (
            f"{len(slice_ids)} slices must factor into the outer mesh axes "
            f"(pp, ddp, ep, ...) = {tuple(shape)}; raise pipe_par_size / "
            f"simple_ddp_size to span DCN"
        )
        dcn_shape, per_slice = fact
        return mesh_utils.create_hybrid_device_mesh(
            per_slice, dcn_shape, devices=devices
        )
    try:
        return mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    except (ValueError, NotImplementedError, AssertionError):
        return np.asarray(devices).reshape(shape)


def mesh_from_config(parallelism: dict, devices=None) -> Mesh:
    """Reference YAML `parallelism:` section -> Mesh. Keys:
    simple_ddp_size, fsdp_size, seq_par_size, tensor_par_size,
    pipe_par_size + expert_par_size (capability-plus)."""
    return make_mesh(
        simple_ddp_size=int(parallelism.get("simple_ddp_size", 1)),
        fsdp_size=int(parallelism.get("fsdp_size", 1)),
        seq_par_size=int(parallelism.get("seq_par_size", 1)),
        tensor_par_size=int(parallelism.get("tensor_par_size", 1)),
        pipe_par_size=int(parallelism.get("pipe_par_size", 1)),
        expert_par_size=int(parallelism.get("expert_par_size", 1)),
        devices=devices,
    )


import contextlib
import flax.linen as nn


import contextvars

# Active mesh for ACTIVATION constraints (parameter partitioning flows
# through nn.with_partitioning metadata instead). A contextvar rather than
# jax.sharding.set_mesh: setting the global abstract mesh makes flax unbox
# raw `Partitioned` params with their LOGICAL axis names as mesh axes, which
# explodes; and without either, flax's `_with_sharding_constraint` silently
# NO-OPs every nn.with_logical_constraint (on jax>=0.7 a bare `with mesh:`
# no longer defines the global mesh flax checks). The round-3 MULTICHIP
# dryrun's "Involuntary full rematerialization" warnings were the visible
# symptom of all activation constraints being dropped
# (tests/test_spmd_resharding.py guards the fix).
_ACTIVE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "ucf_vit_tpu_active_mesh", default=None
)


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH.get()


_MANUAL_REGION: contextvars.ContextVar = contextvars.ContextVar(
    "ucf_vit_tpu_manual_region", default=False
)


def fit_spec_to_shape(shape, axes, mesh):
    """Drop PartitionSpec entries whose mesh-axes product does not divide
    the corresponding dim — the single divisibility rule shared by
    activation constraints (logical_constraint) and parameter shardings
    (parallel.train_step.logical_state_sharding / create_sharded_params).
    `axes` is a per-dim sequence of None | axis-name | tuple of names.
    Returns a list (None where replicated)."""
    resolved = []
    for dim, a in enumerate(axes):
        if a is None or not isinstance(a, (str, tuple, list)):
            resolved.append(None)
            continue
        group = (a,) if isinstance(a, str) else tuple(a)
        extent = int(np.prod([mesh.shape[g] for g in group]))
        resolved.append(a if shape[dim] % max(extent, 1) == 0 else None)
    return resolved


def logical_constraint(x, names):
    """Sharding constraint by logical axis names — the framework-wide
    replacement for nn.with_logical_constraint, which requires a *global*
    mesh to act. No active mesh (single-device oracle mode) -> identity.

    Dims whose extent does not divide their mesh-axes product are left
    unconstrained on EVERY path (round 5 — previously manual-region only):
    microbatches can be smaller than the data-shard count, and the UNETR
    decoder's spatial pyramid has levels (9^3 grid, odd sequence lengths)
    that a given sp just doesn't divide — those levels stay replicated
    rather than unevenly padded, and GSPMD reshards at the first level
    that does divide.

    Inside a manual shard_map region (the GPipe schedule,
    manual_region_constraints()) the constraint is emitted as a BARE
    PartitionSpec over the still-auto axes: a NamedSharding built on the
    outer mesh would name the manual axis with type Auto and be rejected on
    pp-varying values."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return x
    from flax.linen import spmd as _spmd

    axes = _spmd.logical_to_mesh_axes(tuple(names))
    if axes is None:
        return x
    resolved = fit_spec_to_shape(x.shape, axes, mesh)
    if all(r is None for r in resolved):
        return x
    spec = jax.sharding.PartitionSpec(*resolved)
    if _MANUAL_REGION.get():
        return jax.lax.with_sharding_constraint(x, spec)
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, spec)
    )


@contextlib.contextmanager
def manual_region_constraints():
    """Mark a manual (shard_map) region: logical_constraint switches to
    bare-PartitionSpec emission over the auto axes (see above)."""
    token = _MANUAL_REGION.set(True)
    try:
        yield
    finally:
        _MANUAL_REGION.reset(token)


@contextlib.contextmanager
def mesh_context(mesh: Mesh):
    """Activate mesh + logical axis rules: inside this context,
    logical_constraint annotations in the models resolve to mesh
    shardings (outside any mesh they are no-ops, which is what makes the
    same model the 'simple mode' numerics oracle — SURVEY.md §4.5)."""
    token = _ACTIVE_MESH.set(mesh)
    try:
        with mesh, nn.logical_axis_rules(LOGICAL_RULES):
            yield
    finally:
        _ACTIVE_MESH.reset(token)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading dim over (ddp, fsdp), rest replicated."""
    return NamedSharding(mesh, P(DATA_AXES, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree onto the mesh, batch-dim-sharded.

    Single-process: the tree holds the global batch; device_put splits it.
    Multi-process (pods): each host passes its LOCAL portion (global /
    process_count, matching its DataModule per-process file shard) and the global
    array is assembled across hosts — the jax-native replacement for the
    reference's per-rank DataLoader + NCCL broadcast feeding
    (`train_masked_fsdp.py:424-533`)."""
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
        )
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(x)), np.asarray(x)
        ),
        tree,
    )
