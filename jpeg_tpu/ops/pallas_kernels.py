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
DEC_PAIR = False  # decode 2 codes per ROW-WIDE shift (1 funnel per pair)
DEC_GROUP = 4    # stream words per gathered row group (G): the HBM gather
                 # feeding the kernel fetches (N, Wg) CONTIGUOUS G-word rows
                 # instead of (N, W) single words — XLA TPU gather cost
                 # scales with index count, so this is ~G x cheaper (measured
                 # 5.4 ms -> 0.1-0.3 ms for a 4 MP band at W=16).  G=4 keeps
                 # the group-alignment slack (and so the kernel row width,
                 # which sets the per-iteration funnel cost) small.


def _decode_stream_kernel(words_ref, phase_ref, out_ref, *, L: int, W: int,
                          G: int):
    """Lockstep bitstream decode of one tile of blocks, entirely in VMEM.

    ``words_ref``: (DEC_TILE, W) int32 — per-block stream words (big-endian
    bytes), gathered as G-word-aligned groups: the block's first code does
    NOT sit at word 0's top bit but ``phase_ref`` (DEC_TILE, 1) bits in
    (``phase < 32*G``).  The kernel first discards that phase with a
    log-depth lane shift + one byte funnel — all VMEM-resident, so the
    group-aligned HBM gather (cheap) never pays an XLA re-alignment pass.

    Each iteration then decodes the code at word 0's top bits and
    funnel-shifts the whole row left by the consumed bit count, so the
    bitstream flows THROUGH static lane positions: no dynamic indexing
    anywhere — the HBM gathers/scatters that made the XLA formulations 100x
    off roofline (126-331 ms for 4 MP) and the cross-lane one-hot
    reductions of the first kernel attempt (23 ms) are all gone.

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

    def peek(words, offset):
        """The 32 bits starting ``offset`` (T,1) in [8,30] bits into the row
        — one narrow funnel over word columns 0 and 1, no row-wide work."""
        w0 = words[:, 0:1]
        w1 = words[:, 1:2]
        a = offset.astype(jnp.uint32)
        return (w0 << a) | ((w1 >> (jnp.uint32(31) - a)) >> 1)

    def parse(win, phase):
        """Decode the code unit at ``win``'s top bits.  Returns the fields
        + bits consumed (adv) + next byte phase."""
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
        # 8 bits for EOB/chain (+ pad to the byte boundary after EOB,
        # derived from the consumed-bits phase), 8+size for codes.
        adv = jnp.where(is_eob, 8 + ((8 - phase) & 7),
                        jnp.where(is_chain, 8, 8 + size))
        return run, amp, is_eob, is_chain, is_code, adv, (phase + adv) & 7

    def apply(run, amp, is_eob, is_chain, is_code, widx, done, out):
        active = done == 0
        wt = widx + run
        store = active & is_code & (wt < L)
        out = out + jnp.where(store & (cols == wt), amp, 0)
        widx = jnp.where(active & is_chain, widx + MAX_RUN,
                         jnp.where(store, wt + 1, widx))
        done = jnp.where(active & is_eob, 1, done)
        return widx, done, out

    def decode_pair(words, phase, widx, done, out):
        """Two codes per ROW-WIDE funnel shift: code 2 is peeked from word
        columns 0-1 at code 1's bit offset (narrow ops only), then the row
        shifts once by the pair's total consumed bits (16..46 < 64)."""
        f1 = parse(words[:, 0:1], phase)
        run1, amp1, eob1, chain1, code1, adv1, phase = f1
        widx, done, out = apply(run1, amp1, eob1, chain1, code1,
                                widx, done, out)
        f2 = parse(peek(words, adv1), phase)
        run2, amp2, eob2, chain2, code2, adv2, phase = f2
        widx, done, out = apply(run2, amp2, eob2, chain2, code2,
                                widx, done, out)
        s = adv1 + adv2                         # [16, 46]
        lane = s >= 32
        wnext = jnp.concatenate([words[:, 1:], zcol], axis=1)
        words = jnp.where(lane, wnext, words)
        wnn = jnp.concatenate([words[:, 1:], zcol], axis=1)
        b = (s & 31).astype(jnp.uint32)
        words = (words << b) | ((wnn >> (jnp.uint32(31) - b)) >> 1)
        return words, phase, widx, done, out

    def body(carry):
        step, words, phase, widx, done, out = carry
        if DEC_PAIR:
            words, phase, widx, done, out = decode_pair(
                words, phase, widx, done, out)
            return step + 2, words, phase, widx, done, out
        for _ in range(DEC_UNROLL):
            words, phase, widx, done, out = decode_one(
                words, phase, widx, done, out)
        return step + DEC_UNROLL, words, phase, widx, done, out

    # Alignment prologue: discard the group phase so the first code sits at
    # word 0's top bit.  Lane shifts are log-depth static slices + selects;
    # the residual byte shift is one funnel (>> 32 is UB, hence >>31>>1).
    words = words_ref[:].astype(jnp.uint32)
    ph = phase_ref[:]                       # (T, 1) int32, bits, < 32*G
    wsh = ph >> 5                           # whole-word part, [0, G)
    k = 1
    while k < G:
        k <<= 1
    k >>= 1
    while k >= 1:
        shifted = jnp.concatenate(
            [words[:, k:], jnp.zeros((DEC_TILE, k), jnp.uint32)], axis=1)
        take = wsh >= k
        words = jnp.where(take, shifted, words)
        wsh = jnp.where(take, wsh - k, wsh)
        k >>= 1
    b = (ph & 31).astype(jnp.uint32)        # byte part, {0, 8, 16, 24}
    wnext = jnp.concatenate([words[:, 1:], zcol], axis=1)
    words = (words << b) | ((wnext >> (jnp.uint32(31) - b)) >> 1)

    init = (jnp.int32(0),
            words,
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, 1), jnp.int32),
            jnp.zeros((DEC_TILE, L), jnp.int32))
    _, _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    out_ref[:] = out


def decode_stream_rows(word_rows, phase, L: int, group: int = DEC_GROUP,
                       interpret=None):
    """(N, W) int32 group-aligned stream words + (N, 1) bit phases ->
    (N, L) int32 levels.  ``phase[i] < 32*group`` is the bit offset of block
    i's first code within its row."""
    if interpret is None:
        interpret = _interpret()
    n, W = word_rows.shape
    grid = pl.cdiv(n, DEC_TILE)
    kern = functools.partial(_decode_stream_kernel, L=L, W=W, G=group)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((DEC_TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((DEC_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((DEC_TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        interpret=interpret,
    )(word_rows, phase)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_blocks(levels, w_t, deq, interpret=None):
    """(N, K) int32 levels -> (N, M) int32 clamped pixel blocks.

    Args:
      w_t: (K, M) transposed fused dezigzag+IDCT operator
        (ops/transform.py:decode_operator).  M may exceed K: with the
        combined decode operator (transform.py:combined_decode_operator)
        M = (d*bs)^2 and the matmul also performs the inflate upsample.
      deq: (K,) int32 dequantization multiplier in zigzag order.
    """
    if interpret is None:
        interpret = _interpret()
    n, K = levels.shape
    M = w_t.shape[1]
    grid = pl.cdiv(n, TILE)
    return pl.pallas_call(
        _decode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, M), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * M, bytes_accessed=4 * n * (K + M),
            transcendentals=0),
        interpret=interpret,
    )(levels, w_t.astype(jnp.float32),
      deq.astype(jnp.int32).reshape(1, K))
