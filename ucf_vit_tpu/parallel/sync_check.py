"""Runtime replica-consistency check: detect silent parameter desync.

The reference's TP/DDP stack keeps replicas consistent *by construction*
(broadcast at init, `src/UCF_VIT/utils/misc.py:129-238` process groups) and
never verifies them again: a silent HBM bit flip, a misbehaving collective,
or a host-side divergence (the classic "rank 3 loaded a different
checkpoint") trains to garbage with no diagnostic. This module is the
runtime detector the reference lacks — SURVEY.md §5's "race detection /
TP-sync correctness" subsystem as an *active* check rather than a design
argument.

TPU-native design: one `jax.shard_map` program computes a per-device
fingerprint of every device's LOCAL parameter shards (two f32 reduction
components per device — content and position sensitive), entirely on
device; only `mesh.size` scalars ever reach the host. Devices that hold
identical replicas (same shard coordinates on every axis any parameter is
actually sharded over, e.g. differing only along 'ddp'/'sp') run the same
executable on byte-identical inputs, so their fingerprints are bit-equal —
any group disagreement is a real divergence, not float noise.

Wired into the trainer via ``trainer.sync_check_every: N`` (0 = off): every
N optimizer steps the check runs on the live params and raises
`ReplicaDesyncError` naming the divergent devices. The fingerprint program
costs one elementwise pass over the local shards (~O(params/devices) VPU
flops, no collectives besides the output assembly) — negligible at any
realistic stride.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ReplicaDesyncError(RuntimeError):
    """Devices that must hold identical parameter replicas disagree."""


@dataclasses.dataclass
class SyncReport:
    ok: bool
    # mesh axes along which replicas exist (size>1, unused by every leaf)
    redundancy_axes: Tuple[str, ...]
    n_groups: int  # number of replica groups compared
    # [(group_coords, [(device_id, fingerprint), ...])] for unequal groups
    mismatches: List[Tuple[Dict[str, int], List[Tuple[int, Tuple[float, ...]]]]]

    def describe(self) -> str:
        if self.ok:
            return (
                f"replica consistency OK: {self.n_groups} groups bit-equal "
                f"across axes {list(self.redundancy_axes)}"
            )
        lines = []
        for coords, devs in self.mismatches:
            devs_s = ", ".join(f"device {d} fp={fp}" for d, fp in devs)
            lines.append(f"  shard group {coords}: {devs_s}")
        return "replica DESYNC detected:\n" + "\n".join(lines)


def _leaf_axes(spec) -> set:
    """Mesh axes a PartitionSpec actually shards over."""
    axes = set()
    for part in (spec or ()):
        if part is None:
            continue
        for ax in (part if isinstance(part, tuple) else (part,)):
            axes.add(ax)
    return axes


# compiled fingerprint programs, keyed by (mesh, pytree structure)
_FP_CACHE: Dict[Any, Any] = {}


def _fingerprint_fn(missing_axes: Tuple[str, ...], out_shape: Tuple[int, ...]):
    def fp(tree):
        t1 = jnp.float32(0.0)
        t2 = jnp.float32(0.0)
        for leaf in jax.tree.leaves(tree):
            x = leaf.astype(jnp.float32).ravel()
            if x.size == 0:
                continue
            # position-sensitive pseudo-random weights: a permuted or
            # shifted corruption changes t2 even if t1 (pure energy)
            # collides. cos() of a linear ramp is cheap VPU work and has
            # no repeating period over any realistic leaf size.
            w = jnp.cos(
                jnp.arange(x.size, dtype=jnp.float32) * jnp.float32(0.7310586)
            )
            t1 = t1 + jnp.vdot(x, x)
            t2 = t2 + jnp.vdot(x, w)
        out = jnp.stack([t1, t2])
        if missing_axes:
            # the value really IS replicated over these axes when healthy;
            # re-typing it as device-varying makes each device report its
            # own copy — the whole point of the check.
            out = jax.lax.pcast(out, missing_axes, to="varying")
        return out.reshape(out_shape)

    return fp


def device_fingerprints(params, mesh: Mesh):
    """Per-device fingerprints of the local shards of ``params``.

    Returns ``(fps, used_axes)``: ``fps`` is a float32 ndarray of shape
    ``mesh.devices.shape + (2,)`` (host-visible on every process) and
    ``used_axes`` is the set of mesh axes any leaf is sharded over.
    """
    leaves = jax.tree.leaves(params)
    specs = []
    for leaf in leaves:
        sh = getattr(leaf, "sharding", None)
        if not isinstance(sh, NamedSharding):
            raise TypeError(
                "sync check needs mesh-sharded (NamedSharding) params; got "
                f"{type(sh).__name__} — run it on the live train state, not "
                "host arrays"
            )
        if sh.mesh.devices.shape != mesh.devices.shape:
            raise ValueError(
                f"param sharded on a different mesh {sh.mesh} than {mesh}"
            )
        specs.append(sh.spec)
    treedef = jax.tree.structure(params)
    spec_tree = jax.tree.unflatten(treedef, specs)

    used_axes = set()
    for s in specs:
        used_axes |= _leaf_axes(s)
    missing = tuple(ax for ax in mesh.axis_names if ax not in used_axes)

    key = (
        mesh,
        treedef,
        tuple((l.shape, str(l.dtype), str(s)) for l, s in zip(leaves, specs)),
    )
    fn = _FP_CACHE.get(key)
    if fn is None:
        out_shape = (1,) * len(mesh.axis_names) + (2,)
        mapped = jax.shard_map(
            _fingerprint_fn(missing, out_shape),
            mesh=mesh,
            in_specs=(spec_tree,),
            out_specs=P(*mesh.axis_names, None),
        )
        # assemble to fully-replicated so every process can read the scalars
        fn = jax.jit(mapped, out_shardings=NamedSharding(mesh, P()))
        _FP_CACHE[key] = fn
    fps = fn(params)
    return np.asarray(jax.device_get(fps)), used_axes


def check_replica_consistency(
    params, mesh: Mesh, raise_on_mismatch: bool = True
) -> SyncReport:
    """Compare fingerprints across devices that must be byte-identical.

    Devices sharing shard coordinates on every *used* mesh axis hold the
    same logical blocks of every leaf; their fingerprints must be bit-equal.
    """
    fps, used_axes = device_fingerprints(params, mesh)
    axis_names = mesh.axis_names
    shape = mesh.devices.shape
    redundancy = tuple(
        ax
        for ax, n in zip(axis_names, shape)
        if n > 1 and ax not in used_axes
    )

    groups: Dict[Tuple[int, ...], List[Tuple[int, ...]]] = {}
    for coords in np.ndindex(*shape):
        key = tuple(
            c for c, ax in zip(coords, axis_names) if ax in used_axes
        )
        groups.setdefault(key, []).append(coords)

    mismatches = []
    for key, members in groups.items():
        ref = fps[members[0]]
        if all(np.array_equal(fps[m], ref) for m in members[1:]):
            continue
        detail = []
        for m in members:
            dev = mesh.devices[m]
            detail.append((int(dev.id), tuple(float(v) for v in fps[m])))
        coords_d = {
            ax: c for ax, c in zip(axis_names, members[0]) if ax in used_axes
        }
        mismatches.append((coords_d, detail))

    report = SyncReport(
        ok=not mismatches,
        redundancy_axes=redundancy,
        n_groups=len(groups),
        mismatches=mismatches,
    )
    if mismatches and raise_on_mismatch:
        raise ReplicaDesyncError(report.describe())
    return report
