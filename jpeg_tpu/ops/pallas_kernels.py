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
MAX_RUN = 15  # RLE zeros-chain length (reference util.py:146-154)


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
    """(N, K) f32 pixel blocks -> (N, L) int32 quantized zigzag levels.

    Args:
      blocks_vec: (N, K) row-major flattened pixel blocks.  K may exceed L:
        with the combined subsample+transform operator
        (ops/transform.py:combined_encode_operator) K = (d*bs)^2 — the
        whole coefficient path is this one matmul.
      op_t: (K, L) transposed fused operator.
      mul, div, mask: (L,) quantizer epilogue vectors in zigzag order.
    """
    if interpret is None:
        interpret = _interpret()
    n, K = blocks_vec.shape
    L = op_t.shape[1]
    vecs2 = lambda v: v.reshape(1, L).astype(jnp.float32)
    grid = pl.cdiv(n, TILE)
    return pl.pallas_call(
        _encode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * L, bytes_accessed=4 * n * (K + L),
            transcendentals=0),
        interpret=interpret,
    )(blocks_vec.astype(jnp.float32), op_t.astype(jnp.float32),
      vecs2(mul), vecs2(div), vecs2(mask))


DEC_TILE = 1024  # block rows per grid step for the bitstream decode kernel
DEC_UNROLL = 2   # codes decoded per while-loop iteration (overhead amortizer)


def _decode_stream_kernel(words_ref, out_ref, *, L: int, W: int):
    """Lockstep bitstream decode of one tile of blocks, entirely in VMEM.

    ``words_ref``: (DEC_TILE, W) int32 — per-block stream words, word k
    holding bytes [4k, 4k+4) of the block's stream (big-endian).  Each
    iteration decodes the code at word 0's top bits and funnel-shifts the
    whole row left by the consumed bit count, so the bitstream flows
    THROUGH static lane positions: no dynamic indexing anywhere — the HBM
    gathers/scatters that made the XLA formulations 100x off roofline
    (126-331 ms for 4 MP) and the cross-lane one-hot reductions of the
    first kernel attempt (23 ms) are all gone.

    All rows advance one code per iteration; a tile exits as soon as every
    row hit EOB, so sparse content pays its own code count, not the
    worst-case L + L//15 + 2.
    """
    max_steps = L + L // MAX_RUN + 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (DEC_TILE, L), 1)
    zcol = jnp.zeros((DEC_TILE, 1), jnp.uint32)

    def cond(carry):
        step, _words, _phase, _widx, done, _out = carry
        return (step < max_steps) & (jnp.min(done) == 0)

    def decode_one(words, phase, widx, done, out):
        # The row's next 32 bits are ALWAYS word 0: after each code the
        # whole row funnel-shifts left by the consumed bits (one static
        # slice + two variable shifts — no gathers, no reductions).
        win = words[:, 0:1]                          # (T, 1) uint32
        run = (win >> 28).astype(jnp.int32)
        size = ((win >> 24) & 0xF).astype(jnp.int32)
        is_eob = (run == 0) & (size == 0)
        is_chain = (run == MAX_RUN) & (size == 0)
        is_code = ~is_eob & ~is_chain
        sign = ((win >> 23) & 1).astype(jnp.int32)
        nmag = jnp.maximum(size - 1, 0).astype(jnp.uint32)
        mag = ((win >> (jnp.uint32(23) - nmag))
               & ((jnp.uint32(1) << nmag) - 1)).astype(jnp.int32)
        amp = jnp.where(sign == 1, mag, -mag)

        active = done == 0
        wt = widx + run
        store = active & is_code & (wt < L)
        out = out + jnp.where(store & (cols == wt), amp, 0)
        widx = jnp.where(active & is_chain, widx + MAX_RUN,
                         jnp.where(store, wt + 1, widx))
        # Bits consumed: 8 for EOB/chain (+ pad to the byte boundary after
        # EOB, derived from the consumed-bits phase), 8+size for codes.
        adv = jnp.where(is_eob, 8 + ((8 - phase) & 7),
                        jnp.where(is_chain, 8, 8 + size))
        phase = (phase + adv) & 7
        done = jnp.where(active & is_eob, 1, done)
        # adv in [8, 30] so both shift amounts are well-defined (< 32).
        sh = adv.astype(jnp.uint32)
        wnext = jnp.concatenate([words[:, 1:], zcol], axis=1)
        words = (words << sh) | (wnext >> (jnp.uint32(32) - sh))
        return words, phase, widx, done, out

    def body(carry):
        step, words, phase, widx, done, out = carry
        for _ in range(DEC_UNROLL):
            words, phase, widx, done, out = decode_one(
                words, phase, widx, done, out)
        return step + DEC_UNROLL, words, phase, widx, done, out

    init = (jnp.int32(0),
            words_ref[:].astype(jnp.uint32),
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, L), jnp.int32))
    _, _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    out_ref[:] = out




def decode_stream_words(word_rows, L: int, interpret=None):
    """(N, W) int32 per-block stream words -> (N, L) int32 levels."""
    if interpret is None:
        interpret = _interpret()
    n, W = word_rows.shape
    grid = pl.cdiv(n, DEC_TILE)
    kern = functools.partial(_decode_stream_kernel, L=L, W=W)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((DEC_TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((DEC_TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        interpret=interpret,
    )(word_rows)


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
