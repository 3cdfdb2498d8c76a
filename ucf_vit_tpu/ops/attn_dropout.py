"""Counter-based attention-dropout masks (shared by the flash kernel, ring
attention, and their tests).

The reference runs `attn_drop > 0` inside its fused attention kernels at any
sequence length (xformers `memory_efficient_attention(..., p=attn_drop)`,
reference `src/UCF_VIT/simple/building_blocks.py:163-174`, where the dropout
mask is generated on the fly by the kernel's philox stream). The TPU-native
equivalent here is a stateless integer hash instead of a stateful PRNG:

    keep(row, col) = lowbias32(seed, bh, global_row, global_col) >= rate * 2^32

Properties this buys:

- **No mask storage**: the backward regenerates the identical mask from the
  same coordinates — the same recompute discipline the flash kernel already
  uses for the probabilities.
- **Tile independence**: the mask is a function of *global* coordinates, so
  the forward and backward kernels may tile the sequence differently (they
  do: the backward clamps its kv block for VMEM) and still agree bit-exactly.
- **Interpret-mode parity**: plain uint32 arithmetic lowers everywhere;
  `pltpu.prng_seed` has no interpret lowering in this JAX build, so the
  hash is also what makes the CPU test suite possible. Verified bit-identical
  between compiled TPU and interpret mode (tests/test_flash_dropout.py).

The finalizer is Wellons' lowbias32 (xorshift-multiply avalanche); dropout
needs uniformity + decorrelation, not cryptographic strength. All arithmetic
must stay in uint32: mixing an int32 `pl.program_id` into the expression
demotes the whole chain to int32, whose arithmetic right-shift destroys the
avalanche (caught by the uniformity test: keep fraction 0.745 -> 0.700).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Multipliers decorrelating the coordinate streams (golden ratio + xxhash
# primes); any odd constants with good bit mixing work.
_ROW_MUL = 0x9E3779B1
_COL_MUL = 0x85EBCA77
_SEED_MUL = 0xC2B2AE3D
_BH_MUL = 0x27D4EB2F


def _i32c(v: int) -> jnp.ndarray:
    """A uint32 literal as its two's-complement int32 twin. The coordinate
    mixing below runs in int32 because (a) int32 multiply/xor are
    bit-identical to uint32 (wrap-around mod 2^32 either way) and (b) Mosaic's
    `tpu.bitcast` only accepts vectors, so scalars must stay int32 until
    they've been broadcast into the 2-D tile."""
    return jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _lowbias32(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def keep_threshold(rate: float) -> int:
    """uint32 threshold t with P(hash < t) == rate; drop where hash < t."""
    assert 0.0 <= rate < 1.0, f"dropout rate {rate} outside [0, 1)"
    return min(int(round(rate * 4294967296.0)), 4294967295)


def keep_mask(seed, bh, row0, col0, shape: tuple, rate: float) -> jnp.ndarray:
    """Boolean keep mask for a [shape] tile whose top-left element is global
    coordinate (row0, col0) of batch-head `bh`. True = keep.

    seed/bh/row0/col0: int32 scalars (traced or literal). shape: static 2-D.
    Usable inside a Pallas kernel (broadcasted_iota + uint32 VPU ops) and at
    the jnp level (the dense oracle below) with bit-identical results.
    """
    rows = row0 + lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = col0 + lax.broadcasted_iota(jnp.int32, shape, 1)
    seed = jnp.asarray(seed, jnp.int32)
    bh = jnp.asarray(bh, jnp.int32)
    x = (
        rows * _i32c(_ROW_MUL)
        ^ cols * _i32c(_COL_MUL)
        ^ seed * _i32c(_SEED_MUL)
        ^ (bh + jnp.int32(1)) * _i32c(_BH_MUL)
    )
    # one VECTOR bitcast into the unsigned domain for the avalanche (logical
    # shifts + unsigned threshold compare are the only sign-sensitive steps)
    x = lax.bitcast_convert_type(x, jnp.uint32)
    return _lowbias32(x) >= jnp.uint32(keep_threshold(rate))


def dense_keep_mask(
    seed, n_bh: int, n_q: int, n_kv: int, rate: float, *, row0=0, col0=0
) -> jnp.ndarray:
    """[n_bh, n_q, n_kv] oracle mask — exactly what the flash kernels
    regenerate tile-by-tile. Materializes O(N^2); for tests and the einsum
    fallback only."""
    bh_ids = jnp.arange(n_bh, dtype=jnp.int32)
    return jax.vmap(
        lambda b: keep_mask(seed, b, row0, col0, (n_q, n_kv), rate)
    )(bh_ids)


def fold_seed(seed, *indices) -> jnp.ndarray:
    """Mix shard indices (e.g. lax.axis_index of mesh axes that shard batch
    or heads) into a dropout seed so replica-local coordinate systems don't
    reuse one mask pattern. int32 wrap-around arithmetic, deterministic."""
    s = jnp.asarray(seed, jnp.int32)
    for idx in indices:
        s = s * jnp.int32(1000003) + jnp.asarray(idx, jnp.int32) + jnp.int32(1)
    return s


def seed_from_key(key) -> jnp.ndarray:
    """Derive an int32 dropout seed from a JAX PRNG key (the model layer
    hands us a `make_rng('dropout')` key; the hash wants a scalar)."""
    return jax.random.randint(
        key, (), minval=0, maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )
