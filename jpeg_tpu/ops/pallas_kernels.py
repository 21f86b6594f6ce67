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

TILE = 1024  # max block rows per grid step (see _tile_rows)


def _tile_rows(K: int, M: int) -> int:
    """Block rows per grid step for the matmul kernels, sized so the scoped
    VMEM working set (double-buffered in/out tiles + the f32 intermediate +
    the resident operator panel) stays under ~12 MiB of the 16 MiB chip
    budget.  d = 8 (K = M <= 128) keeps the full 1024; d = 24 (L = 576)
    measured 16.47 MiB at 1024 rows — over the limit by 0.5 MiB."""
    t = ((12 << 20) - 4 * K * M) // (12 * (K + M))
    return max(8, min(TILE, t // 8 * 8))


MAX_RUN = 15   # RLE zeros-chain length (reference util.py:146-154)
MAX_SIZE = 15  # RLE size-field cap (reference util.py:156)


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
    tile = _tile_rows(K, L)
    grid = pl.cdiv(n, tile)
    return pl.pallas_call(
        _encode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * L, bytes_accessed=4 * n * (K + L),
            transcendentals=0),
        interpret=interpret,
    )(blocks_vec.astype(jnp.float32), op_t.astype(jnp.float32),
      vecs2(mul), vecs2(div), vecs2(mask))


DEC_TILE = 1024  # block columns per grid step for the bitstream decode kernel
DEC_UNROLL = 2   # codes decoded per while-loop iteration (overhead amortizer)


def _decode_stream_kernel(words_ref, phase_ref, out_ref, *, L: int, W: int,
                          G: int, WE: int):
    """Lockstep bitstream decode of one tile of blocks, entirely in VMEM.

    NATURAL in/out layout, TRANSPOSED compute: ``words_ref`` is
    (DEC_TILE, W) int32 — row t holding the OVERLAP-TABLE row containing
    block t's stream words (big-endian bytes): W = 2G words starting at
    block t's G-word group boundary, so the whole block plus its alignment
    slack is inside the row ((max_bb + 2) // 4 <= G, see
    entropy/device_codec.py:dec_group).  ``phase_ref`` (DEC_TILE, 1) is
    each block's start-bit offset within its row (``phase < 32*G``).
    The kernel transposes both operands in VMEM and transposes the out
    plane back: the XLA-side relayouts of the old (W, T)-in/(L, T)-out
    convention round-tripped ~19 MB through HBM per 4 MP band — moving
    them inside Mosaic measured the full entropy decode at 0.64 vs
    0.92 ms (benchmarks/probes/probe_dec4.py).

    For the compute loop, blocks live on the LANE axis: every per-block
    scalar (run, size, amp, widx, done, ...) is a (1, T) lane row — at
    T=1024 that is 8 packed vregs per op, where a rows layout would make
    each a (T, 1) sublane column (~128 mostly-empty vregs per op, ~16x
    more VPU work; measured 3-5 ms vs ~1 ms for a 4 MP band).

    The kernel first discards the alignment phase with a log-depth sublane
    shift + one byte funnel, then TRIMS the buffer to ``WE`` rows — after
    alignment every block's data sits in its first ceil(max_bb/4) words,
    so the per-iteration funnel never pays the slack half of the row
    (measured 0.31 -> 0.19 ms for a 4.2 MP band at W=32, WE=12).  Each
    iteration decodes the code at word-row 0's top bits and funnel-shifts
    every column up by its consumed bit count, so the bitstream flows
    THROUGH static positions: no dynamic indexing anywhere — the HBM
    gathers/scatters that made the XLA formulations 100x off roofline
    (126-331 ms for 4 MP) are gone.

    All columns advance one code per iteration; a tile exits as soon as
    every column hit EOB, so sparse content pays its own code count, not
    the worst-case L + L//15 + 2.
    """
    max_steps = L + L // MAX_RUN + 2
    T = words_ref.shape[0]          # tile rows (see decode_stream_rows gate)
    # The out plane stays int32: an int16 plane would halve the vregs of
    # the dominant (L, T) compare+select, but Mosaic cannot legalize the
    # packed-i16 select mask ("invalid relayout ... vector<64x1024xi1>"
    # when the (1, T) store row broadcasts against the packed plane).
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, T), 0)
    zrow = jnp.zeros((1, T), jnp.uint32)

    def cond(carry):
        step, _words, _phase, _widx, done, _out = carry
        return (step < max_steps) & (jnp.min(done) == 0)

    def decode_one(words, phase, widx, done, out):
        # Each column's next 32 bits are ALWAYS word-row 0: after each code
        # the column funnel-shifts up by the consumed bits (one static
        # slice + two variable shifts — no gathers, no reductions).
        win = words[0:1, :]                          # (1, T) uint32
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
        # Positions are written at most once (wt strictly increases per
        # column), so a select beats masked-add by one (L, T) pass — the
        # out update is the kernel's dominant per-iteration cost.
        out = jnp.where(store & (cols == wt), amp, out)
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
        wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
        words = (words << sh) | (wnext >> (jnp.uint32(32) - sh))
        return words, phase, widx, done, out

    def body(carry):
        step, words, phase, widx, done, out = carry
        for _ in range(DEC_UNROLL):
            words, phase, widx, done, out = decode_one(
                words, phase, widx, done, out)
        return step + DEC_UNROLL, words, phase, widx, done, out

    # Alignment prologue: discard the in-row phase so the first code sits at
    # word-row 0's top bit.  Word shifts are log-depth static slices +
    # selects; the residual byte shift is one funnel (>> 32 is UB, hence
    # >>31>>1).  The trimmed WE-row buffer then carries the whole loop.
    words = jnp.transpose(words_ref[:], (1, 0)).astype(jnp.uint32)
    ph = jnp.transpose(phase_ref[:], (1, 0))   # (1, T) int32, bits, < 32*G
    wsh = ph >> 5                           # whole-word part, [0, G)
    k = 1
    while k < G:
        k <<= 1
    k >>= 1
    while k >= 1:
        shifted = jnp.concatenate(
            [words[k:, :], jnp.zeros((k, T), jnp.uint32)], axis=0)
        take = wsh >= k
        words = jnp.where(take, shifted, words)
        wsh = jnp.where(take, wsh - k, wsh)
        k >>= 1
    b = (ph & 31).astype(jnp.uint32)        # byte part, {0, 8, 16, 24}
    wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
    words = (words << b) | ((wnext >> (jnp.uint32(31) - b)) >> 1)
    words = words[:WE]                      # data fits: see docstring

    init = (jnp.int32(0),
            words,
            jnp.zeros((1, T), jnp.int32),
            jnp.zeros((1, T), jnp.int32),
            jnp.zeros((1, T), jnp.int32),
            jnp.zeros((L, T), jnp.int32))
    _, _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    out_ref[:] = jnp.transpose(out, (1, 0))


def decode_stream_rows(word_rows, phase, L: int, weff: int = 0,
                       interpret=None):
    """(N, W = 2G) int32 overlap-table stream rows + (N, 1) bit phases ->
    (N, L) int32 levels.  ``phase[i] < 32*(W//2)`` is the bit offset of
    block i's first code within its row.

    The kernel computes transposed (blocks on lanes) but takes and
    returns the NATURAL layout, transposing inside VMEM (see
    :func:`_decode_stream_kernel`).  Inputs are zero-padded to a whole
    number of tiles — zero words decode as an immediate EOB, so pad rows
    never extend a tile's lockstep loop.  ``weff`` trims the
    post-alignment buffer (entropy/device_codec.py:dec_weff); 0 keeps all
    W rows (always safe).
    """
    if interpret is None:
        interpret = _interpret()
    n, W = word_rows.shape
    if weff <= 0 or weff > W:
        weff = W
    # VMEM gate: the natural-layout kernel holds the (tile, W) input block,
    # its in-VMEM transpose, the WE-trimmed loop buffer, the (L, tile)
    # compute plane and the (tile, L) out copy live together — at
    # worst-case geometry (L = 576 with max_block_bytes = 0 -> W = 1536)
    # a 1024-row tile is ~23 MiB, past the ~16 MiB chip budget where the
    # old XLA-side-transpose layout fit.  Halve the tile until the
    # working set fits ~12 MiB; typical d = 8 shapes keep the full tile.
    tile = DEC_TILE
    while tile > 128 and 4 * tile * (2 * W + weff + 2 * L) > (12 << 20):
        tile //= 2
    grid = pl.cdiv(n, tile)
    npad = grid * tile
    if npad != n:
        word_rows = jnp.concatenate(
            [word_rows, jnp.zeros((npad - n, W), word_rows.dtype)], axis=0)
        phase = jnp.concatenate(
            [phase, jnp.zeros((npad - n, 1), phase.dtype)], axis=0)
    kern = functools.partial(_decode_stream_kernel, L=L, W=W, G=W // 2,
                             WE=weff)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, L), jnp.int32),
        interpret=interpret,
    )(word_rows, phase)
    return out[:n]


ENC_TILE = 1024  # block columns per grid step for the bitstream encode kernel


def _encode_stream_kernel(cb_ref, vhi_ref, vlo_ref, out_ref, *, L: int,
                          W: int):
    """Lockstep bitstream ENCODE of one tile of blocks, entirely in VMEM —
    the dual of :func:`_decode_stream_kernel`, same TRANSPOSED layout
    (blocks on the LANE axis).

    Inputs are per-slot unit GROUPS precomputed in XLA
    (entropy/device_codec.py:_unit_groups): for slot s of block t,
    ``cb[s, t]`` bits of value ``(vhi << 32) | vlo`` — the slot's zeros-chain
    units (8 bits of 0xF0 each) followed by its run/size/sign/magnitude code
    (8+size bits), <= 55 bits total; slot L is the EOB byte plus the
    pad-to-byte-boundary zeros.  Zero-coefficient slots inside a run have
    cb = 0 and append nothing.

    The (W, T) word buffer per column holds the stream BOTTOM-justified:
    appending c bits funnel-shifts the whole column up by c (one word-row
    select for the c >= 32 half plus one bit funnel — no dynamic indexing),
    then ORs the group value into the 64-bit tail (static rows W-2, W-1).
    L+1 static iterations; an epilogue top-justifies each column (log-depth
    word shift + one byte funnel, as the decode prologue) so row k of the
    output is stream word k, big-endian, zero-padded — the same word
    convention the decode gather consumes.

    Replaces the 12-pass full-buffer ``.at[].add`` scatter formulation,
    which XLA serializes on TPU (measured ~370 ms for a 4.2 MP image once
    the profile's data dependence stopped letting it be dead-coded).
    """
    T = ENC_TILE
    words = jnp.zeros((W, T), jnp.uint32)
    total = jnp.zeros((1, T), jnp.int32)
    for s in range(L + 1):
        c = cb_ref[s:s + 1, :]                    # (1, T) int32, <= 55
        total = total + c
        hi = vhi_ref[s:s + 1, :].astype(jnp.uint32)
        lo = vlo_ref[s:s + 1, :].astype(jnp.uint32)
        words = _append_group(words, c, hi, lo, W)
    out_ref[:] = _top_justify(words, total, W).astype(jnp.int32)


def _append_group(words, c, hi, lo, W: int):
    """Funnel-append a <= 55-bit group (hi << 32 | lo) of c bits to every
    bottom-justified (W, T) column: shift up by c = 32q + r (q in {0, 1}),
    then OR the group into the static tail rows W-2, W-1."""
    T = words.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    up1 = jnp.concatenate([words[1:], zrow], axis=0)
    words = jnp.where(c >= 32, up1, words)
    r = (c & 31).astype(jnp.uint32)
    wnext = jnp.concatenate([words[1:], zrow], axis=0)
    # r = 0 must be identity: >> 32 is UB, hence >>(31-r)>>1
    words = (words << r) | ((wnext >> (jnp.uint32(31) - r)) >> 1)
    return jnp.concatenate(
        [words[:W - 2], words[W - 2:W - 1] | hi, words[W - 1:] | lo],
        axis=0)


def _top_justify(words, total, W: int):
    """Shift every bottom-justified column so the stream's first bit lands
    at word 0 bit 31: the first bit sits 32W - total bits from the top
    (total is a multiple of 8 after the EOB pad)."""
    T = words.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    sh = jnp.int32(32 * W) - total
    wq = sh >> 5            # whole words; <= W-1 (every stream is >= 1 byte)
    k = 1
    while k < W:
        k <<= 1
    k >>= 1                 # largest pow2 <= W-1: keeps words[k:] non-empty
    # (wq <= W-1 = sum of descending powers below W, so coverage is exact;
    # k == W would hand Mosaic a zero-size (0, T) vector when W is a pow2)
    while k >= 1:
        upk = jnp.concatenate(
            [words[k:], jnp.zeros((k, T), jnp.uint32)], axis=0)
        take = wq >= k
        words = jnp.where(take, upk, words)
        wq = jnp.where(take, wq - k, wq)
        k >>= 1
    wr = (sh & 31).astype(jnp.uint32)             # byte multiple, < 32
    wnext = jnp.concatenate([words[1:], zrow], axis=0)
    return (words << wr) | ((wnext >> (jnp.uint32(31) - wr)) >> 1)


def _encode_stream_lv_kernel(lv_ref, out_ref, bb_ref, *, L: int, W: int,
                             nat: bool = True):
    """Bitstream encode straight from LEVELS — the unit-group tables
    (entropy/device_codec.py:_unit_groups) are computed in-register per
    slot instead of being materialized in HBM (3 tables x (N, L+1) int32,
    ~3x the levels themselves; measured 0.28 ms of XLA + ~25 MB of traffic
    at 4.2 MP).

    NATURAL in/out layout, TRANSPOSED compute — the decode kernel's
    convention (see :func:`_decode_stream_kernel`): the (tile, L) levels
    block and the (tile, W) rows output transpose inside VMEM, killing the
    XLA-side ``levels.T`` (~12.6 MB at 4.2 MP) and ``rows.T`` relayouts
    that the old (L, T)-in/(W, T)-out convention forced — measured
    enc_sized 0.97 -> 0.47 ms at 4.2 MP (benchmarks/probes/probe_enc5.py).
    For the compute loop blocks live on the LANE axis; the run-length
    state (index of the previous nonzero, reference util.py:146-154) is a
    (1, T) register carried across the static slot loop.  Emits the
    per-block byte count as a second output (bit-identical to
    _unit_groups' blk_bytes).

    ``nat=False`` keeps the old (L, T)-in / (W, T)-out convention with
    XLA-side transposes: at L = 576 (d = 24) the in-VMEM transpose of a
    (tile, L) block makes Mosaic spill ~250 MB of registers, while the
    XLA relayout is near-bandwidth — large L stays transposed.
    """
    lvT = (jnp.transpose(lv_ref[:], (1, 0)) if nat else lv_ref[:])
    T = lvT.shape[1]
    z = jnp.zeros((1, T), jnp.uint32)
    words = jnp.zeros((W, T), jnp.uint32)
    total = jnp.zeros((1, T), jnp.int32)
    prev = jnp.full((1, T), -1, jnp.int32)
    # A slot's group is <= 55 bits only while its chain count <= 4 (8*4 + 8
    # + 15 = 55).  Runs longer than 74 zeros (possible when L > 75) carry
    # the excess chains in static extra <= 4-byte appends BEFORE the main
    # group — all chain bytes are identical 0xF0, so only the count and the
    # chains-before-code order matter (reference util.py:146-154).  For
    # L <= 75 this is zero extra work.
    n_sub = max(0, -(-((L - 1) // MAX_RUN - 4) // 4)) if L > 75 else 0
    for s in range(L):
        lv = lvT[s:s + 1, :]                      # (1, T) int32
        nz = lv != 0
        absamp = jnp.abs(lv)
        # size = min(bit_length + 1, 15) from the f32 exponent field:
        # |a| < 2**24 converts exactly, so bits>>23 = 127 + floor(log2 a)
        # and size = (bits>>23) - 125 for a >= 1 (a|1 keeps a = 0 defined;
        # nz masks it).  Replaces a 13-compare ladder — ~20 fewer VPU ops
        # per slot.  The clamp matches _geometry's jnp.minimum(.., 15) for
        # out-of-range content (rejected by callers via the max-|level|
        # stat before the buffer is used).
        fb = jax.lax.bitcast_convert_type(
            (absamp | 1).astype(jnp.float32), jnp.uint32)
        size = (fb >> 23).astype(jnp.int32) - 125
        size = jnp.where(size > MAX_SIZE, MAX_SIZE, size)
        run = s - prev - 1
        # run // 15 as an exact magic multiply (2185 = ceil(2**15/15),
        # exact for run < 4681 >> any L)
        nchains = (run * 2185) >> 15
        rrem = run - nchains * MAX_RUN
        for j in range(n_sub):
            over = jnp.clip(nchains - 4 - 4 * j, 0, 4)
            k8o = (8 * over).astype(jnp.uint32)
            # (32 - k8o) & 31 == min(32 - k8o, 31) after the over > 0 mask
            # (k8o is a byte multiple in [0, 32]); Mosaic cannot legalize
            # vector arith.minui, so the clamp must be bitwise.
            pko = jnp.where(
                over > 0,
                jnp.uint32(0xF0F0F0F0)
                >> ((jnp.uint32(32) - k8o) & jnp.uint32(31)), 0)
            co = jnp.where(nz, 8 * over, 0)
            total = total + co
            words = _append_group(words, co, z, jnp.where(nz, pko, 0), W)
        nch = jnp.minimum(nchains, 4) if n_sub else nchains
        sign = (lv > 0).astype(jnp.int32)
        code = ((rrem << (4 + size)) | (size << size)
                | (sign << (size - 1)) | absamp).astype(jnp.uint32)
        # nch bytes of 0xF0, right-justified (same masked-shift form as
        # _unit_groups: the k8 = 0 lane is masked, not shifted by 32)
        k8 = (8 * nch).astype(jnp.uint32)
        # same bitwise clamp as above: Mosaic has no vector arith.minui
        pk = jnp.where(
            nch > 0,
            jnp.uint32(0xF0F0F0F0) >> ((jnp.uint32(32) - k8) & jnp.uint32(31)),
            0)
        sb = (8 + size).astype(jnp.uint32)        # code bits, 9..23 when nz
        lo = jnp.where(nz, (pk << sb) | code, 0)
        hi = jnp.where(nz, pk >> (jnp.uint32(32) - sb), 0)
        c = jnp.where(nz, 8 * nch + 8 + size, 0)
        prev = jnp.where(nz, s, prev)
        total = total + c
        words = _append_group(words, c, hi, lo, W)
    pad = (-(total + 8)) & 7
    c_eob = 8 + pad
    total = total + c_eob
    words = _append_group(words, c_eob, z, z, W)
    rows = _top_justify(words, total, W).astype(jnp.int32)
    if nat:
        out_ref[:] = jnp.transpose(rows, (1, 0))  # (T, W) natural
        bb_ref[:] = jnp.transpose(total >> 3, (1, 0))
    else:
        out_ref[:] = rows
        bb_ref[:] = total >> 3


# Widest levels row the natural-layout encode kernel transposes in VMEM;
# past this (d = 24's L = 576) Mosaic spills registers on the transpose
# and the XLA-side relayout is the cheaper form.
ENC_NAT_MAX_L = 128


def encode_stream_rows_lv(levels, W: int, interpret=None):
    """(N, L) int32 levels -> ((N, W) int32 stream-word rows, (N,) int32
    block bytes), unit groups computed inside the kernel.  Natural in/out
    layout for L <= ENC_NAT_MAX_L (transposes in VMEM, no XLA relayouts);
    wider L keeps the transposed convention (see the kernel docstring)."""
    if interpret is None:
        interpret = _interpret()
    n, L = levels.shape
    nat = L <= ENC_NAT_MAX_L
    # VMEM gate, as decode_stream_rows: the natural block + its transpose
    # + the (W, T) words buffer (plus ~2 append-ladder copies) + the
    # (T, W) out copy live together; halve the tile until ~12 MiB fits.
    # Typical d = 8 content widths (L = 64, W <= 16) keep the full tile.
    tile = ENC_TILE
    while tile > 128 and 4 * tile * (2 * L + 5 * W) > (12 << 20):
        tile //= 2
    grid = pl.cdiv(n, tile)
    npad = grid * tile
    if npad != n:
        levels = jnp.concatenate(
            [levels, jnp.zeros((npad - n, L), jnp.int32)], axis=0)
    kern = functools.partial(_encode_stream_lv_kernel, L=L, W=W, nat=nat)
    if nat:
        rows, bb = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((npad, W), jnp.int32),
                       jax.ShapeDtypeStruct((npad, 1), jnp.int32)],
            interpret=interpret,
        )(levels)
        return rows[:n], bb[:n, 0]
    rows, bb = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((L, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((W, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((W, npad), jnp.int32),
                   jax.ShapeDtypeStruct((1, npad), jnp.int32)],
        interpret=interpret,
    )(levels.T)
    return rows.T[:n], bb[0, :n]


def encode_stream_rows(cbits, vhi, vlo, W: int, interpret=None):
    """(N, L+1) unit-group tables -> (N, W) int32 big-endian stream words.

    Row i holds block i's byte stream top-justified (byte 0 = bits 31..24 of
    word 0), zero-padded to W words; the caller compacts rows into the
    contiguous stream at the blk_bytes boundaries.  The kernel runs
    transposed (blocks on lanes); pad columns have all-zero groups and cost
    nothing beyond the fixed L+1 iterations.
    """
    if interpret is None:
        interpret = _interpret()
    n, L1 = cbits.shape
    grid = pl.cdiv(n, ENC_TILE)
    npad = grid * ENC_TILE
    if npad != n:
        z = jnp.zeros((npad - n, L1), jnp.int32)
        cbits = jnp.concatenate([cbits, z], axis=0)
        vhi = jnp.concatenate([vhi, z], axis=0)
        vlo = jnp.concatenate([vlo, z], axis=0)
    kern = functools.partial(_encode_stream_kernel, L=L1 - 1, W=W)
    spec = pl.BlockSpec((L1, ENC_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((W, ENC_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, npad), jnp.int32),
        interpret=interpret,
    )(cbits.T, vhi.T, vlo.T)
    return out.T[:n]


def _flat_up(x, k: int):
    """Shift a (Hs, 128) array UP by k positions in flat word order
    (word t = sublane*128 + lane): y[t] = x[t + k], zeros shifted in.

    k is static: a lane shift (< 128) is two concats (tail lanes + the next
    sublane's head lanes); a whole-sublane shift (multiple of 128) is one
    sublane concat.  No dynamic indexing.
    """
    Hs = x.shape[0]
    if k % 128 == 0:
        j = k // 128
        return jnp.concatenate(
            [x[j:, :], jnp.zeros((j, 128), x.dtype)], axis=0)
    assert k < 128
    xn = jnp.concatenate([x[1:, :], jnp.zeros((1, 128), x.dtype)], axis=0)
    return jnp.concatenate([x[:, k:], xn[:, :k]], axis=1)


def _merge_rows_kernel(v_ref, q_ref, out_ref, *, W: int, depth: int):
    """All ``depth`` pairwise byte-concat merge rounds of one unit of
    2**depth stream rows, entirely in VMEM.

    Layout: the unit's H = 2**depth * W words live as (H/128, 128) int32 in
    FLAT word order (lanes fastest).  At round d each 2*h-word segment
    (h = W << d) holds row A top-justified in its top half and row B
    top-justified in its bottom half; B must move UP to byte offset
    len(A), i.e. by ``up = 4*h - len(A)`` bytes — a segmented variable
    shift: a log-depth ladder of static :func:`_flat_up` word shifts
    selected per word by the bits of up/4, then one byte funnel for up%4.
    ``q_ref[0, d]`` broadcasts each segment's ``up`` to every word (built
    by the XLA caller, entropy/device_codec.py:_merge_rows_device).
    Cross-segment contamination is masked with iota-derived same-segment
    tests; rows are zero-padded past their lengths and a shared boundary
    word has disjoint byte lanes, so OR is exact concatenation.

    Replaces the XLA pairwise-merge rounds whose ~90 select passes each
    round-tripped the full row data through HBM (measured 1.4-1.65 ms of
    a 2.0 ms 4.2 MP entropy encode).
    """
    Hs = v_ref.shape[1]
    v = v_ref[0].astype(jnp.uint32)
    T = (jax.lax.broadcasted_iota(jnp.int32, (Hs, 128), 0) * 128
         + jax.lax.broadcasted_iota(jnp.int32, (Hs, 128), 1))
    for d in range(depth):
        h = W << d                       # half-segment height, words
        seg = 2 * h
        q = q_ref[0, d]                  # (Hs, 128) int32 up-bytes
        bmask = ((T // h) & 1) == 1
        xb = jnp.where(bmask, v, 0)
        xa = jnp.where(bmask, 0, v)
        qw = q >> 2
        k = 1
        while k <= h:                    # up/4 <= h (up <= 4h bytes)
            ok = (T // seg) == ((T + k) // seg)
            sh = _flat_up(xb, k)
            xb = jnp.where((qw & k) != 0, jnp.where(ok, sh, 0), xb)
            k <<= 1
        rb = ((q & 3) * 8).astype(jnp.uint32)
        ok1 = (T // seg) == ((T + 1) // seg)
        xn = jnp.where(ok1, _flat_up(xb, 1), 0)
        # rb = 0 identity: << 32 is UB, hence >>(31-rb)>>1
        v = xa | (xb << rb) | ((xn >> (jnp.uint32(31) - rb)) >> 1)
    out_ref[0] = v.astype(jnp.int32)


MERGE_TARGET_STEPS = 12   # aim for this many grid steps (3-4 us fixed cost
                          # per step dominated the kernel at 96+ steps)
MERGE_VMEM_BYTES = 12 << 20  # scoped-VMEM budget per grid step (chip limit
                             # 16 MiB; the ladder's live temporaries cost
                             # ~56 unit-heights on top of the depth-high q
                             # block — a 39.8 MiB scoped alloc at 8 stacked
                             # W=42 units calibrated the multiplier)


def merge_rows_units(v, q, W: int, depth: int, interpret=None):
    """(U, H/128, 128) flat-word unit views + (U, depth, H/128, 128)
    per-round up-byte tables -> (U, H/128, 128) merged units.

    Units STACK along the sublane axis inside one grid step: every segment
    size (2h <= H words) divides the unit height H, so the kernel's
    iota-derived same-segment masks treat a (Ub*H/128, 128) stack exactly
    as Ub independent units — no kernel change.  Measured on chip: the
    per-grid-step fixed cost is ~3-4 us (a merge-depth sweep read 3.09 ms
    at 768 steps vs 0.98 ms at 96 for the SAME data), so batching units
    ~8-16x removes most of what the merge kernel was paying.
    """
    if interpret is None:
        interpret = _interpret()
    U, Hs, _ = v.shape
    ub = max(1, -(-U // MERGE_TARGET_STEPS))
    # Scoped-VMEM estimate per stacked unit: the q block (depth heights)
    # plus ~56 unit-heights of ladder temporaries (measured on chip).
    per_unit = (depth + 56) * Hs * 512
    cap = max(1, MERGE_VMEM_BYTES // per_unit)
    ub = min(ub, cap, U)
    up = -(-U // ub) * ub
    if up != U:
        # Pad with zero units: an all-zero q means every round shifts by 0
        # and ORs zeros — pad outputs stay zero and are dropped below.
        v = jnp.concatenate(
            [v, jnp.zeros((up - U, Hs, 128), v.dtype)], axis=0)
        q = jnp.concatenate(
            [q, jnp.zeros((up - U, depth, Hs, 128), q.dtype)], axis=0)
    steps = up // ub
    vs = v.reshape(steps, ub * Hs, 128)
    # (steps, ub, depth, Hs, 128) -> per-step (depth, ub*Hs, 128) stacks
    qs = q.reshape(steps, ub, depth, Hs, 128).transpose(0, 2, 1, 3, 4) \
          .reshape(steps, depth, ub * Hs, 128)
    kern = functools.partial(_merge_rows_kernel, W=W, depth=depth)
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((1, ub * Hs, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, depth, ub * Hs, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ub * Hs, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, ub * Hs, 128), jnp.int32),
        interpret=interpret,
    )(vs, qs)
    return out.reshape(up, Hs, 128)[:U]


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
    tile = _tile_rows(K, M)
    grid = pl.cdiv(n, tile)
    return pl.pallas_call(
        _decode_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, M), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * M, bytes_accessed=4 * n * (K + M),
            transcendentals=0),
        interpret=interpret,
    )(levels, w_t.astype(jnp.float32),
      deq.astype(jnp.int32).reshape(1, K))


def _scan_walk_kernel(words_ref, phase_ref, rem_ref, c0_ref, w0_ref,
                      out_ref, c_ref, wx_ref, *, L: int,
                      W: int, G: int, WE: int, CAP: int):
    """Lockstep speculative boundary-scan walkers — one per stream BYTE.

    Column q walks "the block starting at byte q" with the host scanner's
    exact semantics (entropy/native/entropy.cpp:jt_scan_offsets) and emits
    its byte length, or -1 for everything the host rejects: truncated
    header/code, (run, 0) with run not in {0, 15}, coefficient overflow,
    or no EOB within the unit budget.  Same transposed funnel machinery as
    :func:`_decode_stream_kernel` (rows from the overlap table, alignment
    prologue, trim to WE) minus the (L, T) out plane — walkers record only
    consumed bits.  ``rem_ref`` (1, T) is the stream bits remaining from
    each walker's start byte (<= 0 past the stream end -> immediate -1,
    the absorbing ERR of the speculative table).

    Two-sweep support: ``CAP`` bounds the lockstep iterations; columns
    still live at the cap emit -2 with their carried (consumed bits,
    coefficient index) in ``c_ref``/``wx_ref``, and a later sweep RESUMES
    them via ``c0_ref``/``w0_ref`` (bit offset within the block, so the
    EOB byte-pad stays block-relative) with a row gathered at the
    current — not the original — byte.  The mean walker settles in ~6
    units while a 1024-column tile's max is ~27 (measured, natural 4 MP
    content): capping the first sweep and re-running only the ~13%
    survivors compacted removes most of the lockstep synchronization
    waste (entropy/device_scan.py:_walker_table_pallas).

    Replaces the XLA per-step-gather walkers (entropy/device_scan.py),
    which paid one HBM gather per unit per byte position — measured 156 ms
    for a 340 KB band; the funnel formulation streams each walker's bytes
    through static positions instead.
    """
    max_steps = min(CAP, L + L // MAX_RUN + 2) if CAP else \
        L + L // MAX_RUN + 2
    T = words_ref.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)

    def cond(carry):
        step, _words, _c, _widx, st, _out = carry
        return (step < max_steps) & (jnp.min(st) == 0)

    def walk_one(words, c, widx, st, out, rem):
        win = words[0:1, :]                          # (1, T) uint32
        h = (win >> 24).astype(jnp.int32)            # 8-bit header
        run = h >> 4
        size = h & 0xF
        is_eob = h == 0
        is_chain = h == 0xF0
        is_code = size != 0
        bad = ~is_code & ~is_eob & ~is_chain
        live = st == 0
        wt = widx + run
        err_now = live & ((c + 8 > rem) | bad
                          | (is_code & ((wt >= L) | (c + 8 + size > rem))))
        done_now = live & ~err_now & is_eob
        step_on = live & ~err_now & ~is_eob
        # EOB pads to the byte boundary; starts are byte-aligned so the
        # block-relative pad equals the stream pad (rle_byte_stream.py:54).
        out = jnp.where(done_now, (c + 15) >> 3, out)
        st = jnp.where(err_now, 2, jnp.where(done_now, 1, st))
        widx = jnp.where(step_on & is_chain, widx + MAX_RUN,
                         jnp.where(step_on & is_code, wt + 1, widx))
        adv = jnp.where(step_on, jnp.where(is_code, 8 + size, 8), 0)
        c = c + adv
        sh = adv.astype(jnp.uint32)                  # in [0, 31]
        wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
        words = (words << sh) | ((wnext >> (jnp.uint32(31) - sh)) >> 1)
        return words, c, widx, st, out

    rem = rem_ref[:]

    def body(carry):
        step, words, c, widx, st, out = carry
        for _ in range(DEC_UNROLL):
            words, c, widx, st, out = walk_one(words, c, widx, st, out, rem)
        return step + DEC_UNROLL, words, c, widx, st, out

    # Alignment prologue — identical to the decode kernel's.
    words = words_ref[:].astype(jnp.uint32)
    ph = phase_ref[:]
    wsh = ph >> 5
    k = 1
    while k < G:
        k <<= 1
    k >>= 1
    while k >= 1:
        shifted = jnp.concatenate(
            [words[k:, :], jnp.zeros((k, T), jnp.uint32)], axis=0)
        take = wsh >= k
        words = jnp.where(take, shifted, words)
        wsh = jnp.where(take, wsh - k, wsh)
        k >>= 1
    b = (ph & 31).astype(jnp.uint32)
    wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
    words = (words << b) | ((wnext >> (jnp.uint32(31) - b)) >> 1)
    words = words[:WE]

    init = (jnp.int32(0), words, c0_ref[:], w0_ref[:],
            jnp.where(rem <= 0, 2, 0),               # past-the-end -> ERR
            jnp.full((1, T), -1, jnp.int32))
    _, _, c, widx, st, out = jax.lax.while_loop(cond, body, init)
    out_ref[:] = jnp.where(st == 0, -2, out)         # -2 = capped, resume
    c_ref[:] = c
    wx_ref[:] = widx


def _scan_walk_kernel_single(words_ref, phase_ref, rem_ref, out_ref, *,
                             L: int, W: int, G: int, WE: int):
    """Single-sweep wrapper: no resume inputs, no carried-state outputs —
    the production scan path pays nothing for the (unused-on-TPU)
    two-sweep machinery (~16 HBM bytes per stream byte otherwise)."""
    T = words_ref.shape[1]
    z = jnp.zeros((1, T), jnp.int32)

    class _Zeros:                        # zero-state stand-in for a ref read
        def __getitem__(self, _):
            return z

    class _Sink:                         # discards the carried-state writes
        def __setitem__(self, _k, _v):
            pass

    _scan_walk_kernel(words_ref, phase_ref, rem_ref, _Zeros(), _Zeros(),
                      out_ref, _Sink(), _Sink(), L=L, W=W, G=G, WE=WE,
                      CAP=0)


def scan_walk_rows(word_rows, phase, rem, L: int, weff: int = 0,
                   cap: int = 0, c0=None, w0=None, interpret=None):
    """(P, W = 2G) overlap-table rows + (P, 1) bit phases + (P, 1) remaining
    stream bits -> (P,) int32 block byte lengths (>= 0 settled, -1
    error/garbage).

    Two-sweep form (``cap`` > 0 or ``c0``/``w0`` given — kept tested for
    backends with cheap compaction, unprofitable on TPU per
    entropy/device_scan.py's round-5 note): returns the triple
    ``(lengths, consumed bits, coefficient indices)`` with -2 marking
    columns still live at the cap; resume them via ``c0``/``w0``."""
    if interpret is None:
        interpret = _interpret()
    resume = cap > 0 or c0 is not None or w0 is not None
    n, W = word_rows.shape
    if weff <= 0 or weff > W:
        weff = W
    if cap <= 0:
        cap = L + L // MAX_RUN + 2
    grid = pl.cdiv(n, DEC_TILE)
    npad = grid * DEC_TILE
    if npad != n:
        word_rows = jnp.concatenate(
            [word_rows, jnp.zeros((npad - n, W), word_rows.dtype)], axis=0)
        pad1 = jnp.zeros((npad - n, 1), jnp.int32)
        phase = jnp.concatenate([phase, pad1], axis=0)
        rem = jnp.concatenate([rem, pad1], axis=0)
    spec1 = pl.BlockSpec((1, DEC_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((W, DEC_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    if not resume:
        kern = functools.partial(_scan_walk_kernel_single, L=L, W=W,
                                 G=W // 2, WE=weff)
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[wspec, spec1, spec1],
            out_specs=spec1,
            out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
            interpret=interpret,
        )(word_rows.T, phase.T, rem.T)
        return out[0, :n]
    if c0 is None:
        c0 = jnp.zeros((n, 1), jnp.int32)
    if w0 is None:
        w0 = jnp.zeros((n, 1), jnp.int32)
    if npad != n:
        pad1 = jnp.zeros((npad - n, 1), jnp.int32)
        c0 = jnp.concatenate([c0, pad1], axis=0)
        w0 = jnp.concatenate([w0, pad1], axis=0)
    kern = functools.partial(_scan_walk_kernel, L=L, W=W, G=W // 2, WE=weff,
                             CAP=cap)
    out, c, wx = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[wspec, spec1, spec1, spec1, spec1],
        out_specs=[spec1, spec1, spec1],
        out_shape=[jax.ShapeDtypeStruct((1, npad), jnp.int32),
                   jax.ShapeDtypeStruct((1, npad), jnp.int32),
                   jax.ShapeDtypeStruct((1, npad), jnp.int32)],
        interpret=interpret,
    )(word_rows.T, phase.T, rem.T, c0.T, w0.T)
    return out[0, :n], c[0, :n], wx[0, :n]


def _chase_kernel(n_ref, e_ref, out_ref, ok_ref, *, nb: int, rows: int):
    """Serial orbit chase over a VMEM-resident end-table.

    The boundary scan's phase 2 — s_{b+1} = E[s_b] — is pure pointer
    chasing: log-depth pointer doubling costs P*log2(nb) HBM gather work
    (measured 49-210 ms at 0.5-2 MB), while this kernel holds E entirely
    in VMEM and walks the nb-step chain at register latency: each step is
    one dynamic sublane slice + a lane one-hot reduce (~8 VPU ops on
    (1, 128)).  E is (rows, 128) int32, entry q at [q >> 7, q & 127],
    padded with the ERR sentinel; out is the packed starts table in the
    same layout; ok = (chase end == the target end offset).  ``n_ref`` is
    (2,) SMEM: [target end, start offset] — a nonzero start chases a
    band that begins mid-buffer (api-level multi-band containers).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    cap = rows * 128 - 1

    def body(b, carry):
        pos, row = carry
        row = jnp.where(lanes == (b & 127), pos, row)

        @pl.when((b & 127) == 127)
        def _():                        # flush one packed row per 128 steps
            out_ref[pl.ds(b >> 7, 1), :] = row

        p = jnp.minimum(pos, cap)
        erow = e_ref[pl.ds(p >> 7, 1), :]
        nxt = jnp.sum(jnp.where(lanes == (p & 127), erow, 0)
                      ).astype(jnp.int32)
        return nxt, row

    end, row = jax.lax.fori_loop(
        0, nb, body, (n_ref[1], jnp.zeros((1, 128), jnp.int32)))
    if nb & 127:                        # partial last row never hit a flush
        out_ref[pl.ds(nb >> 7, 1), :] = row
    ok_ref[0, 0] = (end == n_ref[0]).astype(jnp.int32)


def _chase_multi_kernel(hdr_ref, e_ref, out_ref, ok_ref, *, nb: int,
                        rows: int, B: int):
    """B independent orbit chases in ONE serial loop (one per band of a
    multi-band container): chain j's position lives on sublane j, so the
    j lookups of a step are independent and pipeline behind each other —
    the wall cost per step grows far slower than x B, while the serial
    step count drops from B*nb (B separate chase calls) to nb.  Same
    E-table layout and flush scheme as :func:`_chase_kernel`; ``hdr_ref``
    is (2B,) SMEM [targets..., start offsets...], out is
    (ceil(nb/128), B, 128) packed starts."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    cap = rows * 128 - 1

    def body(b, carry):
        pos, row = carry                    # (B, 1), (B, 128)
        row = jnp.where(lanes == (b & 127), pos, row)

        @pl.when((b & 127) == 127)
        def _():
            out_ref[pl.ds(b >> 7, 1), :, :] = row[None]

        nxts = []
        for j in range(B):
            p = jnp.minimum(pos[j, 0], cap)
            erow = e_ref[pl.ds(p >> 7, 1), :]
            nxts.append(jnp.sum(
                jnp.where(lanes == (p & 127), erow, 0)).astype(jnp.int32))
        pos = jnp.concatenate([x.reshape(1, 1) for x in nxts], axis=0)
        return pos, row

    pos0 = jnp.concatenate(
        [hdr_ref[B + j].reshape(1, 1) for j in range(B)], axis=0)
    end, row = jax.lax.fori_loop(
        0, nb, body, (pos0, jnp.zeros((B, 128), jnp.int32)))
    if nb & 127:
        out_ref[pl.ds(nb >> 7, 1), :, :] = row[None]
    for j in range(B):
        ok_ref[0, j] = (end[j, 0] == hdr_ref[j]).astype(jnp.int32)


def chase_starts_multi(E, targets, s0s, nb: int, interpret=None):
    """(P2,) end-table + (B,) target ends + (B,) start offsets ->
    ((B, nb) starts, (B,) ok).  One kernel, nb serial steps for all B
    chains (vs B*nb for per-band :func:`chase_starts` calls — measured
    the bulk of the fused foreign decode's scan share at B=3)."""
    if interpret is None:
        interpret = _interpret()
    B = targets.shape[0]
    P2 = E.shape[0]
    rows = -(-P2 // 128)
    ep = jnp.concatenate([E.astype(jnp.int32),
                          jnp.full(rows * 128 - P2, P2, jnp.int32)])
    nbp = -(-max(nb, 1) // 128) * 128
    hdr = jnp.concatenate([targets.astype(jnp.int32),
                           s0s.astype(jnp.int32)])
    kern = functools.partial(_chase_multi_kernel, nb=nb, rows=rows, B=B)
    out, ok = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows, 128), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((nbp // 128, B, 128),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, B), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nbp // 128, B, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)],
        interpret=interpret,
    )(hdr, ep.reshape(rows, 128))
    starts = out.transpose(1, 0, 2).reshape(B, nbp)[:, :nb]
    return starts, ok[0] != 0


# Largest E table the chase kernel holds resident.  The kernel's only
# other VMEM is the packed starts block (nb ints) and registers, so the
# table can take most of the ~16 MiB chip budget; 13 MiB covers a 4K
# qtable image's ~3 MB quarter-capped stream (4 B/byte position), whose
# pointer-doubling fallback measured ~380 ms of P*log2(nb) gathers.
CHASE_VMEM_CAP = 13 << 20


def chase_starts(E, n_bytes, nb: int, s0=None, interpret=None):
    """(P2,) int32 end-table (ERR-padded) + target end offset -> ((nb,)
    starts, ok bool).  ``s0`` (traced scalar, default 0) is the chase's
    start offset.  Requires 4*P2 <= CHASE_VMEM_CAP (caller checks)."""
    if interpret is None:
        interpret = _interpret()
    P2 = E.shape[0]
    rows = -(-P2 // 128)
    ep = jnp.concatenate([E.astype(jnp.int32),
                          jnp.full(rows * 128 - P2, P2, jnp.int32)])
    nbp = -(-max(nb, 1) // 128) * 128
    if s0 is None:
        s0 = jnp.int32(0)
    hdr = jnp.stack([n_bytes.astype(jnp.int32),
                     jnp.asarray(s0, jnp.int32)])
    kern = functools.partial(_chase_kernel, nb=nb, rows=rows)
    out, ok = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows, 128), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((nbp // 128, 128),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nbp // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=interpret,
    )(hdr, ep.reshape(rows, 128))
    return out.reshape(-1)[:nb], ok[0, 0] != 0
