"""Device-side bitstream geometry: exact per-block compressed sizes in jnp.

Computes, entirely on device (sharded, jit-safe), the exact number of bytes
each block will occupy in the entropy-coded stream — the same geometry the
host codec derives (jpeg_tpu/entropy/numpy_codec.py:69-80, itself from
reference util.py:134-229):

  per nonzero:  8 * (run // 15) zero-chain bits + 8 + size code bits,
                size = bit_length(|amp|) + 1
  per block:    + 8 EOB bits, then rounded up to a whole byte.

Uses: compressed-size metrics without host round-trips; allocation of output
offsets for the distributed bitstream stitch (an exclusive prefix sum of the
per-shard byte counts, reduced with XLA collectives under GSPMD).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_RUN = 15


def _bit_length(absamp):
    """Exact bit length of nonnegative int32 values (0 -> 0)."""
    # frexp on f32 is exact for |amp| <= 16383 << 2**24.
    _, e = jnp.frexp(absamp.astype(jnp.float32))
    return jnp.where(absamp > 0, e, 0).astype(jnp.int32)


def block_bits(levels):
    """(..., L) zigzag levels -> (...,) exact bit count before byte padding."""
    nz = levels != 0
    absamp = jnp.abs(levels)
    size = _bit_length(absamp) + 1

    # Zeros-run before each nonzero: previous nonzero index via running max.
    L = levels.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    marked = jnp.where(nz, idx, jnp.int32(-1))
    pmax = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    prev = jnp.concatenate(
        [jnp.full(pmax.shape[:-1] + (1,), -1, dtype=pmax.dtype),
         pmax[..., :-1]], axis=-1)
    run = idx - prev - 1

    group = jnp.where(nz, 8 * (run // MAX_RUN) + 8 + size, 0)
    return jnp.sum(group, axis=-1) + 8  # + EOB


def block_bytes(levels):
    """(..., L) levels -> (...,) exact byte count of each block's stream."""
    return (block_bits(levels) + 7) >> 3


def total_bytes(levels):
    """Total compressed payload bytes over all leading axes (scalar).

    Under ``jit`` with sharded ``levels`` this lowers to local sums plus an
    XLA all-reduce over the mesh — the collective path for size metrics.
    """
    return jnp.sum(block_bytes(levels))
