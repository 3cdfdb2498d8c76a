"""Explicit collective library with chosen forward/backward behavior.

Capability parity with reference `src/UCF_VIT/utils/dist_functions.py` (691
lines of torch.autograd.Function pairs — the "conjugate operator" building
blocks of tensor parallelism, SURVEY.md §2.4). Under GSPMD most of these are
unnecessary: sharding annotations make XLA insert collectives and their
transposes automatically (that is how the models in this framework get TP).
This module exists for the explicit shard_map escape hatch — custom kernels,
manual Megatron-style layers, and capability parity with the reference's
public API.

Every function must be called inside shard_map (or another axis context where
`axis_name` is bound). Forward/backward pairs (reference cites):

| here                       | forward      | backward     | reference          |
|----------------------------|--------------|--------------|--------------------|
| f_broadcast_b_identity     | broadcast(0) | identity     | :362-377           |
| f_identity_b_allreduce     | identity     | all-reduce   | :403-437           |
| f_allreduce_b_identity     | all-reduce   | identity     | :515-547           |
| f_identity_b_broadcast     | identity     | broadcast(0) | :501-511           |
| all_reduce                 | all-reduce   | all-reduce   | :680-692           |
| all_gather                 | all-gather   | reduce-scatter | :565-615         |
| reduce_scatter             | reduce-scatter | all-gather | :552-563           |
| all_to_all                 | a2a          | a2a          | :617-677           |
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _select_source(x: jnp.ndarray, axis_name: str, src: int) -> jnp.ndarray:
    """Every shard gets src's value (broadcast-from-src inside SPMD)."""
    idx = lax.axis_index(axis_name)
    # sum over the axis keeping only src's contribution
    masked = jnp.where(idx == src, x, jnp.zeros_like(x))
    return lax.psum(masked, axis_name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def f_broadcast_b_identity(x, axis_name: str, src: int = 0):
    return _select_source(x, axis_name, src)


def _fbbi_fwd(x, axis_name, src):
    return _select_source(x, axis_name, src), None


def _fbbi_bwd(axis_name, src, _, g):
    return (g,)


f_broadcast_b_identity.defvjp(_fbbi_fwd, _fbbi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def f_identity_b_allreduce(x, axis_name: str):
    return x


def _fiba_fwd(x, axis_name):
    return x, None


def _fiba_bwd(axis_name, _, g):
    return (lax.psum(g, axis_name),)


f_identity_b_allreduce.defvjp(_fiba_fwd, _fiba_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def f_allreduce_b_identity(x, axis_name: str):
    return lax.psum(x, axis_name)


def _fabi_fwd(x, axis_name):
    return lax.psum(x, axis_name), None


def _fabi_bwd(axis_name, _, g):
    return (g,)


f_allreduce_b_identity.defvjp(_fabi_fwd, _fabi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def f_identity_b_broadcast(x, axis_name: str, src: int = 0):
    return x


def _fibb_fwd(x, axis_name, src):
    return x, None


def _fibb_bwd(axis_name, src, _, g):
    return (_select_source(g, axis_name, src),)


f_identity_b_broadcast.defvjp(_fibb_fwd, _fibb_bwd)


def all_reduce(x, axis_name: str):
    """psum fwd; psum bwd (lax.psum's own VJP already does this)."""
    return lax.psum(x, axis_name)


def all_gather(x, axis_name: str, axis: int = 0, tiled: bool = True):
    """all-gather fwd; reduce-scatter bwd (lax.all_gather's VJP)."""
    return lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def reduce_scatter(x, axis_name: str, axis: int = 0, tiled: bool = True):
    """reduce-scatter fwd; all-gather bwd (lax.psum_scatter's VJP)."""
    return lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=tiled)


def all_to_all(x, axis_name: str, split_axis: int, concat_axis: int, tiled: bool = True):
    """a2a fwd; a2a bwd (lax.all_to_all is its own transpose)."""
    return lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=tiled
    )


def ulysses_heads_to_seq(x, axis_name: str):
    """[B, H/sp, N, dh] -> [B, H, N/sp, dh]: the Ulysses sequence-parallel
    head<->seq swap (DeepSpeed-Ulysses) the reference's a2a scaffolding was
    staged for (`dist_functions.py:617-677`)."""
    return all_to_all(x, axis_name, split_axis=2, concat_axis=1)


def ulysses_seq_to_heads(x, axis_name: str):
    """[B, H, N/sp, dh] -> [B, H/sp, N, dh]: inverse of ulysses_heads_to_seq."""
    return all_to_all(x, axis_name, split_axis=1, concat_axis=2)
