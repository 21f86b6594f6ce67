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

from ..entropy.device_codec import MAX_RUN, _geometry


def block_bits(levels):
    """(..., L) zigzag levels -> (...,) exact bit count before byte padding.

    Shares the single geometry implementation with the device encoder
    (entropy/device_codec.py) so the estimator can never drift from the
    wire format.
    """
    shape = levels.shape
    flat = levels.reshape(-1, shape[-1])
    _, _, _, _, _, group_bits = _geometry(flat)
    return (jnp.sum(group_bits, axis=-1) + 8).reshape(shape[:-1])  # + EOB


def block_bytes(levels):
    """(..., L) levels -> (...,) exact byte count of each block's stream."""
    return (block_bits(levels) + 7) >> 3


def total_bytes(levels):
    """Total compressed payload bytes over all leading axes (scalar).

    Under ``jit`` with sharded ``levels`` this lowers to local sums plus an
    XLA all-reduce over the mesh — the collective path for size metrics.
    """
    return jnp.sum(block_bytes(levels))
