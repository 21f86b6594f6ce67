"""Pallas TPU kernels: fused coefficient transform + quantization.

The hot op of the codec is the batched block transform (SURVEY.md §3.1 "the
whole codec"): for N blocks of d*d pixels, one (N, L) @ (L, L) matmul with an
elementwise quantization epilogue (L = d*d).  XLA already fuses the epilogue;
the Pallas kernels here additionally keep the operand tile, the operator and
the quantizer vectors resident in VMEM across the whole batch sweep and emit
int32 levels directly, so HBM traffic is exactly one f32 read + one i32 write
per coefficient — the bandwidth speed-of-light for this op.

Encode epilogue (covers all four reference quantizers, see ops/quantize.py):
    levels = round((x @ opT) * mul / div) * mask  -> int32
Decode:
    pixels = clip(round((levels * deq) @ wT), 0, 255) -> int32

Kernels run with a 1-D grid over row tiles; the trailing partial tile is
handled by Pallas' automatic block masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # block rows per grid step; TILE*L*4B << VMEM for any real d


def pack_factor(L: int) -> int:
    """Blocks packed per matmul row so the contraction dim fills the MXU.

    The per-block operator contracts over L = d*d (64 for d=8), wasting the
    128-wide systolic array.  Packing P = 128//L blocks per row with a
    block-diagonal kron(I_P, M) operator makes the contraction dim P*L = 128
    with zero extra FLOPs (the off-diagonal zeros are never materialized as
    work the MXU wouldn't already burn)."""
    return max(1, 128 // L)


def _interpret() -> bool:
    import os
    if os.environ.get("JPEG_TPU_PALLAS") == "interpret":
        return True
    return jax.default_backend() != "tpu"


def _encode_kernel(x_ref, opt_ref, mul_ref, div_ref, mask_ref, out_ref):
    # HIGHEST: full-f32 accumulation (3-pass bf16) — pixel blocks reach
    # 255*d*d and default precision would truncate coefficient mantissas.
    coeffs = jnp.dot(x_ref[:], opt_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    q = jnp.round(coeffs * mul_ref[:] / div_ref[:]) * mask_ref[:]
    out_ref[:] = q.astype(jnp.int32)


def _decode_kernel(lv_ref, wt_ref, deq_ref, out_ref):
    deq = (lv_ref[:] * deq_ref[:]).astype(jnp.float32)
    pix = jnp.dot(deq, wt_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    # BasisChange.invert rounds first (reference basis_change.py:43), then
    # Normalization.invert clamps (reference normalization.py:10-14).
    out_ref[:] = jnp.clip(jnp.round(pix), 0.0, 255.0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_blocks(blocks_vec, op_t, mul, div, mask, interpret=None):
    """(N, L) f32 pixel blocks -> (N, L) int32 quantized zigzag levels.

    Args:
      blocks_vec: (N, L) row-major flattened pixel blocks.
      op_t: (L, L) transposed fused DCT+zigzag operator
        (ops/transform.py:encode_operator).
      mul, div, mask: (L,) quantizer epilogue vectors in zigzag order.
    """
    if interpret is None:
        interpret = _interpret()
    n, L = blocks_vec.shape
    vecs2 = lambda v: v.reshape(1, L).astype(jnp.float32)
    grid = pl.cdiv(n, TILE)
    return pl.pallas_call(
        _encode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * L * L, bytes_accessed=8 * n * L, transcendentals=0),
        interpret=interpret,
    )(blocks_vec.astype(jnp.float32), op_t.astype(jnp.float32),
      vecs2(mul), vecs2(div), vecs2(mask))


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_blocks(levels, w_t, deq, interpret=None):
    """(N, L) int32 levels -> (N, L) int32 clamped pixel blocks.

    Args:
      w_t: (L, L) transposed fused dezigzag+IDCT operator
        (ops/transform.py:decode_operator).
      deq: (L,) int32 dequantization multiplier in zigzag order.
    """
    if interpret is None:
        interpret = _interpret()
    n, L = levels.shape
    grid = pl.cdiv(n, TILE)
    return pl.pallas_call(
        _decode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * L * L, bytes_accessed=8 * n * L, transcendentals=0),
        interpret=interpret,
    )(levels, w_t.astype(jnp.float32),
      deq.astype(jnp.int32).reshape(1, L))
