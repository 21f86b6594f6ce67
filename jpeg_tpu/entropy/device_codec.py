"""Device-side entropy encoder: RLE bit packing as jnp prefix sums + scatter.

The reference packs bits one code at a time in Python (reference:
pipeline/rle_byte_stream.py:48-58, util.py:115-132).  Here the whole band's
bitstream is assembled ON DEVICE inside jit:

1. Per-coefficient geometry (runs, sizes, chain counts) via masked running
   maxima and row prefix sums — the same formulas as the host codec
   (entropy/numpy_codec.py) and the size estimator (parallel/stats.py).
2. Every code unit's absolute bit offset comes from an exclusive prefix sum
   of unit lengths, plus the block's byte-aligned start offset.
3. Each unit value is positioned in a 32-bit window MSB-first and split into
   <= 4 bytes; bytes are deposited with one ``.at[].add(mode='drop')``
   scatter per byte lane.  Units never share bits, so per-byte sums cannot
   carry — add == bitwise-or here.

The output buffer is a static worst-case allocation (23 bits per coefficient
+ EOB, reference util.py:156 caps size at 15); the true length is returned
alongside so callers transfer only the used prefix.  Everything is int32/
uint32 — safe on TPU where x64 is unavailable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_RUN = 15
MAX_SIZE = 15
MAX_AMP = (1 << (MAX_SIZE - 1)) - 1  # 16383


def worst_case_block_bytes(L: int) -> int:
    """Static per-block output bound: all coefficients nonzero at size 15."""
    return ((8 + MAX_SIZE) * L + 8 + 7) // 8


def _bit_length(absamp):
    _, e = jnp.frexp(absamp.astype(jnp.float32))
    return jnp.where(absamp > 0, e, 0).astype(jnp.int32)


def _geometry(levels):
    """Per-slot code geometry for (N, L) int32 levels."""
    nz = levels != 0
    absamp = jnp.abs(levels).astype(jnp.int32)
    # Clamp keeps the bit-window shifts well-defined for |amp| > 16383;
    # such levels make the stream unrepresentable and callers reject them
    # via the returned max before using the buffer.
    size = jnp.minimum(_bit_length(absamp) + 1, MAX_SIZE)

    L = levels.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    marked = jnp.where(nz, idx, jnp.int32(-1))
    pmax = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    prev = jnp.concatenate(
        [jnp.full(pmax.shape[:-1] + (1,), -1, dtype=pmax.dtype),
         pmax[..., :-1]], axis=-1)
    run = idx - prev - 1
    nchains = run // MAX_RUN
    rrem = run - nchains * MAX_RUN
    group_bits = jnp.where(nz, 8 * nchains + 8 + size, 0)
    return nz, absamp, size, nchains, rrem, group_bits


def _deposit(out, valid, byte0, window, nbytes):
    """Scatter the top ``nbytes`` bytes of each 32-bit window into ``out``."""
    oob = out.shape[0]
    for j in range(nbytes):
        b = ((window >> (24 - 8 * j)) & 0xFF).astype(jnp.int32)
        idx = jnp.where(valid, byte0 + j, oob)
        out = out.at[idx.reshape(-1)].add(b.reshape(-1), mode="drop")
    return out


def encode_stream(levels):
    """(N, L) int32 levels -> (bytes_u8[worst_case], blk_bytes (N,) int32).

    ``bytes_u8[: blk_bytes.sum()]`` is bit-identical to the host codec's
    output; the remainder is zero.  jit-safe, fully vectorized.
    """
    n_blocks, L = levels.shape
    if n_blocks * worst_case_block_bytes(L) * 8 >= 2 ** 31:
        # Bit positions are int32 (TPU has no int64): ~256 MiB of worst-case
        # output is the per-call ceiling.  Split the batch instead.
        raise ValueError(
            f"{n_blocks} blocks of L={L} exceed the device encoder's int32 "
            f"bit-position range; encode in smaller chunks")
    nz, absamp, size, nchains, rrem, group_bits = _geometry(levels)

    blk_bits = jnp.sum(group_bits, axis=-1) + 8          # + EOB
    blk_bytes = (blk_bits + 7) >> 3
    blk_start = jnp.cumsum(blk_bytes) - blk_bytes         # exclusive, bytes

    excl = jnp.cumsum(group_bits, axis=-1) - group_bits
    gpos = blk_start[:, None] * 8 + excl                  # unit-group bit pos

    out = jnp.zeros(n_blocks * worst_case_block_bytes(L), jnp.int32)

    # Zeros chains: 8-bit 0xF0 units before the code (util.py:146-154).
    cmax = (L - 1) // MAX_RUN
    for k in range(cmax):
        valid = nz & (k < nchains)
        pos = gpos + 8 * k
        byte0, off = pos >> 3, pos & 7
        window = jnp.uint32(0xF0) << (24 - off).astype(jnp.uint32)
        out = _deposit(out, valid, byte0, window, 2)

    # Code units: run(4) | size(4) | sign(1) | magnitude(size-1), MSB-first;
    # sign '1' = positive (util.py:120-123).
    sign = (levels > 0).astype(jnp.int32)
    v = ((rrem << (4 + size)) | (size << size)
         | (sign << (size - 1)) | absamp).astype(jnp.uint32)
    cl = 8 + size                                         # <= 23 bits
    cpos = gpos + 8 * nchains
    byte0, off = cpos >> 3, cpos & 7
    window = v << (32 - off - cl).astype(jnp.uint32)
    out = _deposit(out, nz, byte0, window, 4)

    return out.astype(jnp.uint8), blk_bytes


def decode_stream(stream_u8, starts, L: int):
    """Block-parallel device decode: (stream bytes, block start offsets) ->
    (N, L) int32 levels.

    The serial part of decode — finding where each block's bitstream starts
    — happens host-side in one O(bytes) C++ scan (native_codec.scan_offsets),
    which also validates the stream.  Here every block then advances in
    lockstep, one code per step, using 4-byte gathers to read its 32-bit
    code window; bounded by the max codes per block (L + L//15 + 2), so the
    whole loop is jit-compilable with static shapes.
    """
    n = starts.shape[0]
    nbytes = stream_u8.shape[0]
    if nbytes * 8 >= 2 ** 31:
        raise ValueError(
            f"{nbytes}-byte stream exceeds the device decoder's int32 "
            f"bit-position range (~256 MiB); decode in smaller chunks")
    stream = stream_u8.astype(jnp.uint32)
    max_steps = L + L // MAX_RUN + 2
    rows = jnp.arange(n, dtype=jnp.int32)

    def read_window(pos):
        """32-bit MSB-first window aligned so the code starts at bit 31."""
        byte0 = pos >> 3
        w = jnp.zeros(pos.shape, jnp.uint32)
        for j in range(4):
            b = stream[jnp.minimum(byte0 + j, nbytes - 1)]
            w = (w << 8) | b
        return w << (pos & 7).astype(jnp.uint32)

    def body(_, carry):
        pos, widx, done, out = carry
        active = ~done
        win = read_window(pos)
        run = (win >> 28).astype(jnp.int32)
        size = ((win >> 24) & 0xF).astype(jnp.int32)
        is_eob = (run == 0) & (size == 0)
        is_chain = (run == MAX_RUN) & (size == 0)
        is_code = ~is_eob & ~is_chain

        sign = ((win >> 23) & 1).astype(jnp.int32)
        nmag = jnp.maximum(size - 1, 0)
        mag = ((win >> (23 - nmag).astype(jnp.uint32))
               & ((jnp.uint32(1) << nmag.astype(jnp.uint32)) - 1)
               ).astype(jnp.int32)
        amp = jnp.where(sign == 1, mag, -mag)

        wt = widx + run
        store = active & is_code & (wt < L)
        out = out.at[rows, jnp.clip(wt, 0, L - 1)].add(
            jnp.where(store, amp, 0))
        widx = jnp.where(active & is_chain, widx + MAX_RUN,
                         jnp.where(store, wt + 1, widx))
        adv = jnp.where(is_eob | is_chain, 8, 8 + size)
        newpos = pos + adv
        newpos = jnp.where(is_eob, (newpos + 7) & ~jnp.int32(7), newpos)
        pos = jnp.where(active, newpos, pos)
        done = done | (active & is_eob)
        return pos, widx, done, out

    init = (starts.astype(jnp.int32) * 8,
            jnp.zeros(n, jnp.int32),
            jnp.zeros(n, bool),
            jnp.zeros((n, L), jnp.int32))
    _, _, _, out = jax.lax.fori_loop(0, max_steps, body, init)
    return out


def encode_bands_stream(levels, n_bands: int):
    """(B*N, L) levels of B equal bands -> (bytes_u8, band_bytes (B,), mx).

    Blocks are band-major, and every block's stream is byte-aligned, so the
    concatenated buffer splits into per-band streams at the returned byte
    counts.  ``mx`` is the max |level| for host-side representability
    checking (|amp| > 16383 cannot be coded; reference util.py:162-174).
    """
    stream, blk_bytes = encode_stream(levels)
    band_bytes = jnp.sum(blk_bytes.reshape(n_bands, -1), axis=-1)
    mx = jnp.max(jnp.abs(levels)).astype(jnp.int32)
    return stream, band_bytes, mx
