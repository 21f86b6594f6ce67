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
import numpy as np

MAX_RUN = 15
MAX_SIZE = 15
MAX_AMP = (1 << (MAX_SIZE - 1)) - 1  # 16383

# Bit positions are int32 (TPU has no int64): one encode_stream call may
# address at most this many worst-case output bits.  Larger batches are
# split transparently by encode_stream_chunks (tests shrink this to
# exercise the chunking without gigabyte allocations).
_CAP_BITS = 2 ** 31


def worst_case_block_bytes(L: int) -> int:
    """Static per-block output bound: all coefficients nonzero at size 15."""
    return ((8 + MAX_SIZE) * L + 8 + 7) // 8


def max_chunk_blocks(L: int) -> int:
    """Largest block count whose worst-case bit positions stay in int32."""
    return max(1, (_CAP_BITS // 8 - 1) // worst_case_block_bytes(L))


def _geometry(levels):
    """Per-slot code geometry for (N, L) int32 levels."""
    nz = levels != 0
    absamp = jnp.abs(levels).astype(jnp.int32)
    # size = min(bit_length + 1, 15) from the f32 exponent field: |a| <
    # 2**24 converts exactly, so bits>>23 = 127 + floor(log2 a) and size =
    # (bits>>23) - 125 for a >= 1 (a|1 keeps a = 0 defined).  |amp| >
    # 16383 clamps to 15 either way — such levels make the stream
    # unrepresentable and callers reject them via the returned max before
    # using the buffer.  Zero slots report size = 0 (the nz mask is one
    # fused select; without it an unmasked consumer would silently emit
    # wrong size fields — the old frexp form's contract, kept on purpose).
    fbits = jax.lax.bitcast_convert_type(
        (absamp | 1).astype(jnp.float32), jnp.uint32)
    size = jnp.minimum((fbits >> 23).astype(jnp.int32) - 125, MAX_SIZE)
    size = jnp.where(nz, size, 0)

    L = levels.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    marked = jnp.where(nz, idx, jnp.int32(-1))
    # Previous-nonzero via an UNROLLED shifted-max ladder: measured 0.12 ms
    # faster than lax.associative_scan at 4.2 MP (benchmarks/probes/
    # probe_stats.py — the scan materializes its ladder through HBM while
    # the explicit slices fuse).
    pmax = marked
    k = 1
    while k < L:
        shifted = jnp.concatenate(
            [jnp.full(pmax.shape[:-1] + (k,), -1, pmax.dtype),
             pmax[..., :-k]], axis=-1)
        pmax = jnp.maximum(pmax, shifted)
        k <<= 1
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


def block_bytes_of(levels):
    """(N, L) int32 levels -> (N,) int32 stream bytes per block.

    Pure geometry (prefix scans + sums, no kernels) — cheap enough to run in
    the coefficient-encode program so the host can size the entropy encode
    (row width + output cap) from the band's ACTUAL content instead of the
    23-bit/coefficient worst case (see :func:`encode_stream_sized`).
    """
    group_bits = _geometry(levels)[-1]
    blk_bits = jnp.sum(group_bits, axis=-1) + 8           # + EOB
    return (blk_bits + 7) >> 3


def _unit_groups(levels):
    """(N, L) int32 levels -> per-slot unit-group tables for the Pallas
    encode kernel (ops/pallas_kernels.py:_encode_stream_kernel).

    Returns ``(cbits, vhi, vlo, blk_bytes)``: slot s of block i appends
    ``cbits[i, s]`` bits of value ``(vhi << 32) | vlo`` (MSB of the group at
    bit cbits-1) — the slot's zeros-chain units (one 0xF0 byte each,
    reference util.py:146-154) followed by its run|size|sign|magnitude code
    (8+size bits, sign '1' = positive, util.py:120-123), <= 55 bits total.
    Slot L is the EOB byte plus the pad to the byte boundary (all zeros).
    Zero slots inside a run contribute cbits = 0.  All vectorized scans and
    elementwise ops — no gathers or scatters.
    """
    nz, absamp, size, nchains, rrem, group_bits = _geometry(levels)
    sign = (levels > 0).astype(jnp.int32)
    code = ((rrem << (4 + size)) | (size << size)
            | (sign << (size - 1)) | absamp).astype(jnp.uint32)
    # nchains bytes of 0xF0, right-justified (nchains <= (L-1)//15 <= 4 for
    # any real L; shift-by-32 is UB so the k = 0 lane is masked, not relied
    # on to shift to zero)
    k8 = (8 * nchains).astype(jnp.uint32)
    pk = jnp.where(
        nchains > 0,
        jnp.uint32(0xF0F0F0F0) >> jnp.minimum(jnp.uint32(32) - k8, 31), 0)
    s = (8 + size).astype(jnp.uint32)            # code bits, 9..23 when nz
    vlo = (pk << s) | code
    vhi = pk >> (jnp.uint32(32) - s)
    cb = group_bits                               # 0 when not nz
    vlo = jnp.where(nz, vlo, 0)
    vhi = jnp.where(nz, vhi, 0)
    sum_bits = jnp.sum(cb, axis=-1)
    pad = (-(sum_bits + 8)) & 7
    cb_eob = (8 + pad).astype(jnp.int32)
    blk_bytes = (sum_bits + 8 + pad) >> 3
    z = jnp.zeros_like(cb_eob)[:, None]
    cbits = jnp.concatenate([cb, cb_eob[:, None]], axis=-1)
    vhi_t = jnp.concatenate([vhi.astype(jnp.int32), z], axis=-1)
    vlo_t = jnp.concatenate([vlo.astype(jnp.int32), z], axis=-1)
    return cbits, vhi_t, vlo_t, blk_bytes


def encode_words_full(L: int) -> int:
    """Worst-case encode row width in words, whole sublanes (8) for tiling."""
    return -(-(-(-worst_case_block_bytes(L) // 4)) // 8) * 8


def encode_words_bucket(L: int, max_block_bytes: int = 0) -> int:
    """Row width (words) for the encode kernel, sized by the band's ACTUAL
    longest block when known.

    The funnel kernel's per-append shift cost and the merge/gather data
    volume all scale with the row width, so a typical photographic band
    (longest block ~20-50 bytes vs the 185-byte worst case for L=64) runs
    the whole entropy encode on 4-6x less data.  Widths are bucketed to
    bound the number of compiled programs: even-word steps to 16, then
    coarser (multiples of 4/8, ~1.5x past 48); 0 means worst case.  Even
    widths keep the merge-kernel constraint (2**depth * W) % 128 == 0 for
    any depth >= 6 — Mosaic handles the non-multiple-of-8 sublane tiles by
    masking, and a typical photographic band (max block ~40 B -> W=10 vs
    the old 8-sublane bucket 16) runs the merge on ~40% less data
    (measured 1.10 -> 0.92 ms for the 4.2 MP sized encode).
    """
    full = encode_words_full(L)
    if max_block_bytes <= 0 or max_block_bytes >= worst_case_block_bytes(L):
        return full
    w = -(-max_block_bytes // 4)
    b = 2
    while b < full:
        if w <= b:
            return b
        if b < 16:
            b += 2
        elif b < 32:
            b += 4
        elif b < 48:
            b += 8
        else:
            b = -(-(b * 3 // 2) // 8) * 8
    return full


def encode_cap_bucket(total_bytes: int, worst_bytes: int) -> int:
    """Output-buffer byte cap for :func:`compact_rows`, sized by the band's
    ACTUAL stream length.

    The compaction gather's index count scales with the cap (one index per
    GATHER_G-word output group), so sizing it by the real total instead of
    the worst case cuts the dominant compaction cost by the compression
    ratio (typically 5-10x).  Caps grow in 1.5x steps from 64 KiB so the
    number of compiled programs stays logarithmic.
    """
    cap = 65536
    while cap < total_bytes:
        cap = -(-(cap * 3 // 2) // 4096) * 4096
    return min(cap, worst_bytes)


def encode_rows(levels, interpret=None, W: int = 0):
    """(N, L) int32 levels -> ((N, W) int32 stream-word rows, blk_bytes).

    Row i is block i's byte stream, top-justified big-endian words,
    zero-padded to W words (0 = the worst case; callers that know the
    band's longest block pass :func:`encode_words_bucket` — every block
    MUST satisfy blk_bytes <= 4*W or its row overflows silently); assembled
    entirely in VMEM by the Mosaic funnel kernel.  The contiguous stream is
    rows compacted at the blk_bytes boundaries (see :func:`encode_stream`).
    """
    import os
    from ..ops import pallas_kernels as PK
    L = levels.shape[-1]
    if W <= 0:
        W = encode_words_full(L)
    on_tpu = jax.default_backend() == "tpu"
    use_lv = on_tpu and (L > 75
                         or not os.environ.get("JPEG_TPU_ENC_TABLES"))
    if os.environ.get("JPEG_TPU_ENC_LV") and not os.environ.get(
            "JPEG_TPU_ENC_TABLES"):
        use_lv = True
    if use_lv:
        # Default on real TPU: unit groups computed inside the kernel (no
        # HBM tables; JPEG_TPU_ENC_TABLES=1 keeps the XLA-tables path for
        # A/B, except L > 75 which ALWAYS takes the lv kernel there: runs
        # longer than 74 zeros need more than 4 chain bytes, which the
        # 64-bit table groups cannot carry — the lv kernel splits them
        # into extra appends).  Interpret mode (test-only: the production
        # CPU path is the scatter formulation) defaults to the tables path
        # — the lv kernel's ~40 interpreted ops per slot are too slow for
        # the suite — JPEG_TPU_ENC_LV=1 forces it
        # (tests/test_merge_kernel.py:test_lv_kernel_long_runs).
        return PK.encode_stream_rows_lv(levels, W, interpret=interpret)
    if L > 75 and not os.environ.get("JPEG_TPU_ENC_TABLES"):
        # Table groups are 64-bit: > 4 chain bytes cannot be represented,
        # so long zero-runs would corrupt silently.  Callers are expected
        # to route large-L off-TPU encodes to the scatter path
        # (encode_stream's guard / sized_entropy_default(L)); reaching here
        # without the explicit tables override is a bug.
        raise ValueError(
            f"tables encode path cannot carry L={L} zero-run chains; "
            "use the lv kernel (JPEG_TPU_ENC_LV=1) or the scatter path")
    cbits, vhi, vlo, blk_bytes = _unit_groups(levels)
    rows = PK.encode_stream_rows(cbits, vhi, vlo, W, interpret=interpret)
    return rows, blk_bytes


# Compaction parameters: rows merge pairwise MERGE_DEPTH times into units of
# 2**MERGE_DEPTH blocks (min unit = 2**MERGE_DEPTH bytes, one EOB byte per
# block), then ONE grouped gather of GATHER_G-word groups builds the
# contiguous stream.  Correctness needs min unit >= 4*GATHER_G bytes so no
# output group spans more than two units (the overlap extension covers the
# second); 2**MERGE_DEPTH >= 4*GATHER_G keeps that true for any content.
# Measured on chip (benchmarks/probe_sized.py, 4.2 MP): the XLA merge rounds
# fuse to near-zero marginal cost while the gather costs ~ per index, so
# deeper merges + bigger groups win: (9, 128) beats (6, 16) by ~25% both at
# worst-case and content-sized shapes.  A round-5 re-sweep read depth 11
# ~10% faster at 4.2 MP (probes/probe_sized2.py), but 11 overflows the
# merge kernel's scoped-VMEM stacking budget at 4K unit heights (33.7 vs
# 16 MiB — merge_rows_units' per-unit estimate is calibrated at depth 9)
# and a same-process A/B could not reproduce the win outside tunnel
# noise, so 9 stays.
MERGE_DEPTH = 9
GATHER_G = 128
GATHER_G_MAX = 1024  # ceiling for the content-adaptive group bucket


def effective_depth(n: int) -> int:
    """The merge depth :func:`compact_rows` actually uses for n blocks.

    Small batches don't amortize deep merges (unit padding to 2**m blocks
    would dominate), so the depth scales down at trace time — exposed so
    phase-1 stats programs (:func:`min_unit_bytes_of`) bucket against the
    SAME unit boundaries the compaction will use.
    """
    m = MERGE_DEPTH
    while m > 6 and (1 << m) > 2 * max(n, 1):
        m -= 1
    return m


def min_unit_bytes_of(blk_bytes):
    """(N,) int32 per-block bytes -> min byte length over the merge units
    that CONSTRAIN the compaction gather (scalar int32; 2**30 = none).

    An output group of 4G bytes may contain at most one unit start, so G
    is bounded by the shortest unit — EXCEPT the last real unit and the
    all-pad units after it: a group reaching past them reads only
    past-the-stream bytes, which compact_rows masks/zeroes (see its
    overlap-extension notes).  Runs in the phase-1 stats program next to
    :func:`block_bytes_of`; the host buckets G from the pulled scalar
    (:func:`gather_group_bucket`).
    """
    n = blk_bytes.shape[0]
    u = 1 << effective_depth(n)
    n_pad = -(-n // u) * u
    if n_pad != n:
        blk_bytes = jnp.concatenate(
            [blk_bytes, jnp.zeros(n_pad - n, blk_bytes.dtype)])
    ulen = jnp.sum(blk_bytes.reshape(-1, u), axis=-1).astype(jnp.int32)
    U = ulen.shape[0]
    idx = jnp.arange(U, dtype=jnp.int32)
    last = jnp.max(jnp.where(ulen > 0, idx, -1))
    big = jnp.int32(2 ** 30)
    return jnp.min(jnp.where((ulen > 0) & (idx < last), ulen, big))


def gather_group_bucket(min_unit: int, n_blocks: int, W: int) -> int:
    """Content-adaptive gather group size (words, power of two).

    Correctness needs 4*G <= the shortest constraining unit (so no output
    group wholly contains a non-last unit) and (2**depth * W) % G == 0 (so
    the extended unit rows reshape into whole G-word groups).  Typical
    photographic units are KBs long where the static content-oblivious
    bound (2**(depth-2), from 1-byte minimum blocks) allowed only 128 —
    bigger groups cut the gather index count proportionally.
    """
    wu = (1 << effective_depth(n_blocks)) * W
    g = 1
    while (2 * g <= GATHER_G_MAX and 8 * g <= min_unit
           and wu % (2 * g) == 0):
        g *= 2
    return g


def _shift_rows_right(rows, nbytes, width):
    """Byte-shift each row right by its own ``nbytes`` within ``width`` words.

    rows: (N, w) int32 big-endian words, zero-padded to ``width``; returns
    (N, width).  Log-depth word selects + one byte funnel — no gathers.
    """
    n, w = rows.shape
    if w < width:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n, width - w), rows.dtype)], axis=1)
    q = (nbytes >> 2)[:, None]
    k = 1
    while k < width:
        rolled = jnp.concatenate(
            [jnp.zeros((n, k), rows.dtype), rows[:, :-k]], axis=1)
        # binary decomposition: ascending k must test the BIT, not greedy >=
        rows = jnp.where((q & k) > 0, rolled, rows)
        k <<= 1
    r = ((nbytes & 3) * 8)[:, None].astype(jnp.uint32)
    u = rows.astype(jnp.uint32)
    prev = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.uint32), u[:, :-1]], axis=1)
    # r = 0 identity: << 32 is UB, hence (<< (31-r)) << 1
    out = (u >> r) | ((prev << (jnp.uint32(31) - r)) << 1)
    return out.astype(jnp.int32)


def _merge_rows(rows, lens, depth):
    """Pairwise byte-exact concat of (N, W) word rows, ``depth`` rounds.

    Returns (N / 2**depth, W * 2**depth) unit rows and their byte lengths.
    Each round shifts the odd rows right by the even rows' byte length and
    ORs — rows are zero-padded past their length, and a shared boundary
    word has disjoint byte lanes, so OR is exact concatenation.
    """
    for _ in range(depth):
        A, B = rows[0::2], rows[1::2]
        la, lb = lens[0::2], lens[1::2]
        w2 = 2 * rows.shape[1]
        Ap = jnp.concatenate([A, jnp.zeros_like(A)], axis=1)
        rows = Ap | _shift_rows_right(B, la, w2)
        lens = la + lb
    return rows, lens


def _merge_rows_device(rows, lens, depth):
    """Kernel-path equivalent of :func:`_merge_rows`: all rounds in VMEM.

    The per-round shift amounts are tiny per-segment scalars, so they are
    precomputed here in XLA and broadcast to word height (``up = 4*h -
    len(A)`` bytes for each merged pair) — the kernel then needs no
    dynamic lookups at all (ops/pallas_kernels.py:_merge_rows_kernel).
    """
    from ..ops import pallas_kernels as PK
    n, W = rows.shape
    u = 1 << depth
    U = n // u
    H = u * W
    l = lens.reshape(U, u)
    qs = []
    for d in range(depth):
        h = W << d
        la = l[:, 0::2]
        up = 4 * h - la                              # (U, S_d) bytes
        qs.append(jnp.broadcast_to(
            up[:, :, None], (U, up.shape[1], 2 * h)).reshape(U, H // 128,
                                                             128))
        l = la + l[:, 1::2]
    q = jnp.stack(qs, axis=1)                        # (U, depth, H/128, 128)
    out = PK.merge_rows_units(rows.reshape(U, H // 128, 128), q, W, depth)
    return out.reshape(U, H), l.reshape(U)


def _use_merge_kernel(W, depth) -> bool:
    import os
    if os.environ.get("JPEG_TPU_MERGE_XLA"):
        return False
    return depth >= 1 and ((1 << depth) * W) % 128 == 0 and \
        _pallas_decode_enabled()


def compact_rows(rows, blk_bytes, L, cap: int = 0, G: int = 0,
                 emit: str = "u8"):
    """(N, W) per-block stream-word rows -> contiguous stream bytes.

    Returns a uint8 buffer of ``cap`` bytes (0 = the static worst case)
    whose first ``blk_bytes.sum()`` bytes are the concatenated per-block
    streams — the same contract as :func:`encode_stream`.  A nonzero cap
    MUST be >= the true total (callers size it from device-computed stats,
    :func:`encode_cap_bucket`); the gather grid scales with it, which is
    the point — the gather is the dominant compaction cost.

    ``emit="words"`` returns the stream as big-endian uint32 words instead
    (the compaction's native form): device-resident consumers
    (:func:`decode_stream`, whose word table is exactly this) skip BOTH
    relayouts — the u8 unpack here and the u8 -> u32 repack there, each a
    measured ~0.6 ms/MB on TPU.

    TPU gather cost scales with INDEX COUNT (measured ~7 ns/idx random,
    far less for the monotonic ids used here), so the design minimizes
    indices: blocks merge pairwise MERGE_DEPTH times (log-depth funnel
    shifts, no gathers) into units long enough that one gather of
    G-word output groups — ids nondecreasing, offsets from two
    small scatters + prefix scans — assembles the stream.

    ``G = 0`` uses the static content-oblivious bound (GATHER_G capped by
    2**(depth-2): units of 2**depth blocks are >= 2**depth bytes even when
    every block is a bare EOB).  A nonzero G MUST come from
    :func:`gather_group_bucket` over this band's own device-computed
    :func:`min_unit_bytes_of` — a too-large G would mis-attribute output
    groups that wholly contain a short unit.
    """
    n, W = rows.shape
    m = effective_depth(n)
    if G <= 0:
        G = min(GATHER_G, 1 << (m - 2))
    u_blocks = 1 << m
    # Structural: extended unit rows must reshape into whole G-word groups.
    while G > 1 and (u_blocks * W) % G:
        G >>= 1
    gb = 4 * G                                    # bytes per output group
    worst = n * worst_case_block_bytes(L)
    if cap > 0:
        worst = min(cap, worst)
    n_pad = -(-n // u_blocks) * u_blocks
    if n_pad != n:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n_pad - n, W), rows.dtype)], axis=0)
        blk_bytes = jnp.concatenate(
            [blk_bytes, jnp.zeros(n_pad - n, blk_bytes.dtype)])
    if _use_merge_kernel(W, m):
        units, ulen = _merge_rows_device(rows, blk_bytes, m)
    else:
        units, ulen = _merge_rows(rows, blk_bytes, m)
    U, Wu = units.shape

    # Overlap extension: append >= 4G bytes of the NEXT unit to each row so
    # an output group spanning a unit boundary reads valid bytes.  Every
    # constraining unit is >= 4G bytes (the static 1-byte-per-block bound
    # for G = 0, min_unit_bytes_of for explicit G), so one successor
    # suffices (an all-pad or short LAST unit can only be followed by
    # past-the-stream reads, which are zeros/masked).  ext_w is a multiple
    # of G so rows reshape into whole G-word groups for the gather below.
    hw = min(2 * G, Wu)   # a successor shorter than 2G words is taken whole
    head = jnp.concatenate([units[1:, :hw],
                            jnp.zeros((1, hw), units.dtype)], axis=0)
    if hw < 2 * G:
        head = jnp.concatenate(
            [head, jnp.zeros((U, 2 * G - hw), units.dtype)], axis=1)
    ext_w = Wu + 2 * G
    ext = jnp.concatenate(
        [units, jnp.zeros((U, 2 * G), units.dtype)], axis=1) | \
        _shift_rows_right(head, ulen, ext_w)

    # Output-group id/offset tables (all on a small ~worst/4G grid).
    ustart = jnp.cumsum(ulen) - ulen              # (U,) exclusive, bytes
    n_grp = -(-worst // gb)
    first_grp = -(-ustart[1:] // gb)              # unit u live from this grp
    inc = jnp.zeros(n_grp, jnp.int32).at[first_grp].add(
        1, mode="drop")
    ids = jnp.cumsum(inc)                         # (n_grp,) nondecreasing
    sfill = jnp.zeros(n_grp, jnp.int32).at[first_grp].max(
        ustart[1:].astype(jnp.int32), mode="drop")
    su = jax.lax.associative_scan(jnp.maximum, sfill)   # start byte of ids[g]

    gpos = jnp.arange(n_grp, dtype=jnp.int32) * gb
    o = gpos - su                                 # in-unit byte offset
    # TPU gather cost ~ index count and is ~20x cheaper for whole-ROW
    # gathers (tbl[idx]) than for 2-D elementwise indexing (measured 0.5 ms
    # vs 13 ms at this scale) — so fetch the 2G-word window around each
    # group as TWO row gathers from the G-word-group-reshaped table, then
    # discard the in-window byte offset with a log-depth funnel.
    tblg = ext.reshape(U * (ext_w // G), G)
    wg = o >> (2 + G.bit_length() - 1)            # group index within unit
    # Past the stream end su stops advancing, so o grows without bound;
    # clamp (those groups are masked to zero below — the buffer remainder
    # must stay zero) to keep gather indices in range.
    idxA = jnp.minimum(ids * (ext_w // G) + wg, tblg.shape[0] - 2)
    win = jnp.concatenate([tblg[idxA], tblg[idxA + 1]],
                          axis=1).astype(jnp.uint32)   # (n_grp, 2G)
    sh_b = o - (wg << (2 + G.bit_length() - 1))   # bytes into window, < 4G
    q = (sh_b >> 2)[:, None]
    k = 1
    while k < G:
        rolled = jnp.concatenate(
            [win[:, k:], jnp.zeros((n_grp, k), jnp.uint32)], axis=1)
        win = jnp.where((q & k) > 0, rolled, win)
        k <<= 1
    r = ((sh_b & 3) * 8)[:, None].astype(jnp.uint32)
    nxt = win[:, 1:G + 1]
    out_words = ((win[:, :G] << r) | ((nxt >> (jnp.uint32(31) - r)) >> 1))
    total = jnp.sum(blk_bytes)
    out_words = jnp.where(gpos[:, None] < total, out_words, 0)

    flat = out_words.reshape(-1)
    if emit == "words":
        return flat[:-(-worst // 4)].astype(jnp.uint32)
    b = jnp.stack([(flat >> 24) & 0xFF, (flat >> 16) & 0xFF,
                   (flat >> 8) & 0xFF, flat & 0xFF], axis=1)
    return b.reshape(-1)[:worst].astype(jnp.uint8)


def encode_stream(levels, emit: str = "u8"):
    """(N, L) int32 levels -> (bytes_u8[worst_case], blk_bytes (N,) int32).

    ``bytes_u8[: blk_bytes.sum()]`` is bit-identical to the host codec's
    output; the remainder is zero.  jit-safe, fully vectorized.
    ``emit="words"`` returns big-endian uint32 words instead of bytes —
    the zero-relayout interchange form for device-resident decode
    (:func:`compact_rows`).

    On TPU (or under JPEG_TPU_PALLAS=interpret) the bitstream is assembled
    by the Mosaic funnel kernel + grouped-gather compaction; the scatter
    formulation below is the CPU/no-Pallas fallback (XLA serializes TPU
    scatters — measured ~370 ms vs a few ms for a 4.2 MP image).  Set
    JPEG_TPU_ENC_SCATTER=1 to force the scatter path for A/B.
    """
    import os
    n_blocks, L = levels.shape
    if n_blocks * worst_case_block_bytes(L) * 8 >= _CAP_BITS:
        # Bit positions are int32 (TPU has no int64): ~256 MiB of worst-case
        # output is the per-call ceiling.  encode_stream_chunks self-splits.
        raise ValueError(
            f"{n_blocks} blocks of L={L} exceed the device encoder's int32 "
            f"bit-position range; use encode_stream_chunks")
    # L > 75 allows zero-runs whose chain bytes overflow the 55-bit funnel
    # group; only the lv kernel splits them (encode_rows routes there on
    # TPU).  In interpret mode that kernel is impractically slow to trace
    # at large L, so CPU/interpret L > 75 takes the scatter formulation —
    # always correct for any run length — unless a kernel path is forced
    # explicitly (JPEG_TPU_ENC_LV / ENC_TABLES, A/B and tests only).
    big_l_ok = (L <= 75 or jax.default_backend() == "tpu"
                or os.environ.get("JPEG_TPU_ENC_LV")
                or os.environ.get("JPEG_TPU_ENC_TABLES"))
    if _pallas_decode_enabled() and big_l_ok and not os.environ.get(
            "JPEG_TPU_ENC_SCATTER"):
        rows, blk_bytes = encode_rows(levels)
        return compact_rows(rows, blk_bytes, L, emit=emit), blk_bytes
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

    if emit == "words":
        if out.shape[0] % 4:
            out = jnp.concatenate(
                [out, jnp.zeros(4 - out.shape[0] % 4, out.dtype)])
        o = out.reshape(-1, 4).astype(jnp.uint32)
        return ((o[:, 0] << 24) | (o[:, 1] << 16)
                | (o[:, 2] << 8) | o[:, 3]), blk_bytes
    return out.astype(jnp.uint8), blk_bytes


def encode_stream_sized(levels, W: int, cap: int, G: int = 0,
                        emit: str = "u8"):
    """(N, L) int32 levels -> (bytes_u8[cap], blk_bytes (N,) int32,
    overflowed bool scalar), with the row width and output buffer sized by
    the band's ACTUAL content.

    The caller measures ``max(block_bytes_of(levels))``, its sum and
    :func:`min_unit_bytes_of` in a first device program (one tiny stats
    pull), buckets them (:func:`encode_words_bucket` /
    :func:`encode_cap_bucket` / :func:`gather_group_bucket`) and traces
    this second program at the sized shapes — typically 4-6x less kernel
    and merge data and 5-10x fewer gather indices than the worst case.
    Output bytes are identical to :func:`encode_stream`'s used prefix.
    Requires the Pallas row path (the scatter fallback has no width knob).

    An undersized W (a block needing more than 4*W bytes) or cap (total
    stream longer than the buffer) would truncate SILENTLY — the wire
    format has no redundancy to catch it (reference rle_byte_stream.py:
    48-58).  Both conditions are checked in-program from the blk_bytes the
    kernel already computes: on violation the whole buffer is zeroed and
    the returned flag set; hosts must raise via :func:`check_sized_ok`.
    """
    if G > 0:
        # Mirror compact_rows' structural clamp so the correctness check
        # below tests the G the gather actually uses.
        u = 1 << effective_depth(levels.shape[0])
        while G > 1 and (u * W) % G:
            G >>= 1
    rows, blk_bytes = encode_rows(levels, W=W)
    buf = compact_rows(rows, blk_bytes, levels.shape[-1], cap, G, emit=emit)
    buf_bytes = buf.shape[0] * (4 if emit == "words" else 1)
    bad = (jnp.max(blk_bytes) > 4 * W) | (jnp.sum(blk_bytes) > buf_bytes)
    if G > 0:
        # An explicit G certifies 4*G <= every constraining unit; verify it
        # against the blk_bytes the kernel just computed (same poison
        # contract as the W/cap checks — gather mis-attribution would
        # corrupt silently otherwise).
        bad = bad | (min_unit_bytes_of(blk_bytes) < 4 * G)
    return jnp.where(bad, buf.dtype.type(0), buf), blk_bytes, bad


def check_sized_ok(bad) -> None:
    """Host-side check of :func:`encode_stream_sized`'s overflow flag."""
    if bool(bad):
        raise ValueError(
            "sized encode overflow: a block exceeded the bucketed row "
            "width or the stream exceeded the output cap — the row width "
            "and cap must come from this band's own device-computed "
            "stats (encode_words_bucket / encode_cap_bucket)")


def _pallas_decode_enabled() -> bool:
    import os
    if os.environ.get("JPEG_TPU_NO_PALLAS"):
        return False
    if os.environ.get("JPEG_TPU_PALLAS") == "interpret":
        return True
    return jax.default_backend() == "tpu"


def sized_entropy_default(L: int = 0) -> bool:
    """Content-sized two-phase encode: on for the Pallas row path unless
    JPEG_TPU_ENC_SIZED=0 (the scatter fallback has no width/cap knobs).

    Off for L > 75 away from a real TPU (unless JPEG_TPU_ENC_LV forces the
    lv kernel): such bands can hold zero-runs needing more than 4 chain
    bytes, which only the lv kernel carries — callers then fall back to
    :func:`encode_stream`, whose own guard routes to the scatter path.
    """
    import os
    if os.environ.get("JPEG_TPU_ENC_SIZED", "1") == "0":
        return False
    if os.environ.get("JPEG_TPU_ENC_SCATTER"):
        return False
    if (L > 75 and jax.default_backend() != "tpu"
            and not os.environ.get("JPEG_TPU_ENC_LV")):
        return False
    return _pallas_decode_enabled()


# Decode overlap-table geometry.  The stream's words are reshaped into
# G-word groups and the table's rows OVERLAP 50%: row g covers words
# [g*G, g*G + 2G).  A block starting anywhere in group g then fits WHOLLY
# in row g together with its alignment slack whenever
# (max_block_bytes + 2) // 4 <= G — so the kernel feed is ONE gather index
# per block (measured 0.07 ms vs 0.58 ms for the per-group scheme at
# 49k blocks; XLA TPU gather cost scales with index count).
_DEC_G_BUCKETS = (16, 24, 32, 48, 64, 96, 128, 192, 256, 384)


def dec_group(L: int, max_block_bytes: int = 0) -> int:
    """Overlap-table group width G (words) for the decode gather.

    Bucketed so the number of compiled programs stays small; rows narrower
    than 16 words measured SLOWER per index (sub-cacheline fetches), so 16
    is the floor even for tiny blocks.  0 means worst case."""
    wc = worst_case_block_bytes(L)
    mb = max_block_bytes if 0 < max_block_bytes < wc else wc
    need = (mb + 2) // 4
    for g in _DEC_G_BUCKETS:
        if need <= g:
            return g
    g = _DEC_G_BUCKETS[-1]
    while need > g:
        g *= 2
    return g


def dec_weff(L: int, max_block_bytes: int = 0, G: int | None = None) -> int:
    """Post-alignment kernel width (words): after the prologue discards the
    in-row phase, every block's data sits in its first ceil(mb/4) words, so
    the per-iteration funnel runs on this trimmed buffer (+1 margin, even
    words to bound program count)."""
    wc = worst_case_block_bytes(L)
    mb = max_block_bytes if 0 < max_block_bytes < wc else wc
    if G is None:
        G = dec_group(L, max_block_bytes)
    we = -(-(-(-mb // 4) + 1) // 2) * 2
    return min(we, 2 * G)


def words_per_block(L: int, max_block_bytes: int = 0) -> int:
    """Decode gather row width in words (= 2*dec_group: the overlap row)."""
    return 2 * dec_group(L, max_block_bytes)


def bucket_block_bytes(L: int, max_block_bytes: int) -> int:
    """Static cache key for a band's longest block: the largest byte count
    with the same decode geometry (G, Weff) — its own fixed point, so all
    bands sharing a geometry share one compiled decode program."""
    G = dec_group(L, max_block_bytes)
    we = dec_weff(L, max_block_bytes, G)
    mb = min(4 * (we - 1), 4 * G + 1, worst_case_block_bytes(L))
    while mb > 1 and (dec_group(L, mb), dec_weff(L, mb)) != (G, we):
        mb -= 1
    return mb


def _bytes_to_be_words(stream_u8, padded: int):
    """(nbytes,) uint8 -> (padded/4,) int32 big-endian stream words.

    One native (n, 4) u8 -> (n,) u32 bitcast plus a 5-op byteswap: the
    earlier reshape-to-(n, 4)-int32 formulation put the bytes on a 4-wide
    minor dim (1/32 lane occupancy) and measured 0.68 ms for a 1.3 MB
    stream — ~14x the data's bandwidth cost.  int32 out (Mosaic has no
    unsigned reductions); <<24 wrapping negative is the right bit pattern.
    """
    nbytes = stream_u8.shape[0]
    b = stream_u8
    if padded != nbytes:
        b = jnp.concatenate([b, jnp.zeros(padded - nbytes, jnp.uint8)])
    x = jax.lax.bitcast_convert_type(b.reshape(-1, 4), jnp.uint32)
    # XLA bitcast packs minor-dim bytes little-endian; the decode kernel
    # wants byte 0 in bits 31..24.
    w = ((x << 24) | ((x & 0xFF00) << 8)
         | ((x >> 8) & 0xFF00) | (x >> 24))
    return w.astype(jnp.int32)


SORT_MARGIN_BYTES = 1500  # summed per-tile-max saving (bytes ~ lockstep
                          # iterations) that repays the unpermute gather +
                          # argsort; chip-calibrated at 4.2 MP (sorted
                          # kernel 0.31 ms vs 0.46 unsorted for a 480-byte
                          # spread; unpermute 0.48 ms)


def sort_pays_off(starts, total_len: int, tile: int = 0) -> bool:
    """Host-side: does length-sorting the blocks save more lockstep
    iterations than the unpermute gather + argsort cost?

    The lockstep decode kernel pays each tile's longest block, so sorting
    helps exactly when the natural block order mixes long and short blocks
    within tiles.  Sum-of-tile-maxima over the natural vs the sorted order
    (lengths are host-known from the boundary scan) measures that saving
    in bytes, which track iterations.
    """
    return sort_pays_off_from_lens(
        np.diff(np.asarray(starts), append=total_len), tile)


def sort_pays_off_from_lens(lens, tile: int = 0) -> bool:
    """:func:`sort_pays_off` on precomputed block byte lengths."""
    from ..ops import pallas_kernels as PK
    tile = tile or PK.DEC_TILE
    lens = np.asarray(lens)
    n = lens.shape[0]
    if n <= tile:
        return False
    pad = (-n) % tile
    if pad:
        lens = np.append(lens, np.zeros(pad, lens.dtype))
    nat = lens.reshape(-1, tile).max(axis=1).sum()
    srt = np.sort(lens).reshape(-1, tile).max(axis=1).sum()
    return int(nat - srt) > SORT_MARGIN_BYTES


def host_stream_arg(arr: np.ndarray) -> np.ndarray:
    """Best host-side form of a stream buffer for :func:`decode_stream`.

    ``arr`` is the zero-padded uint8 stream (length a multiple of 4).  On
    the Pallas path the device wants little-endian int32 words — the view
    is free here, while the device-side u8 -> u32 bitcast measured 0.76 ms
    for 1.3 MB (a relayout, ~250x the data's bandwidth cost); the device
    then pays only a 5-op byteswap (~0.03 ms).  Non-Pallas backends keep
    uint8 (the XLA fallback indexes per byte)."""
    assert arr.dtype == np.uint8 and arr.nbytes % 4 == 0, (arr.dtype,
                                                           arr.shape)
    if _pallas_decode_enabled():
        return arr.view(np.int32)
    return arr


def _be_word_table(stream, nbytes: int, nw: int):
    """Stream buffer (uint8; int32 little-endian words from
    :func:`host_stream_arg`; or uint32 big-endian words from
    ``emit="words"`` encode) -> (nw,) int32 big-endian stream words."""
    if stream.dtype == jnp.uint8:
        return _bytes_to_be_words(stream, 4 * nw)
    x = stream.astype(jnp.uint32) if stream.dtype == jnp.int32 else stream
    have = x.shape[0]
    if have < nw:
        x = jnp.concatenate([x, jnp.zeros(nw - have, jnp.uint32)])
    else:
        x = x[:nw]
    if stream.dtype == jnp.uint32:
        return x.astype(jnp.int32)       # already big-endian device words
    w = ((x << 24) | ((x & 0xFF00) << 8)
         | ((x >> 8) & 0xFF00) | (x >> 24))
    return w.astype(jnp.int32)


def _decode_stream_pallas(stream, starts, L: int, max_block_bytes: int,
                          sort: bool = True, total_len=None):
    """TPU path: ONE gather index per block builds the kernel's stream
    rows from a 50%-overlapping word table, then the Mosaic kernel
    (ops/pallas_kernels.py:_decode_stream_kernel) decodes every block in
    VMEM with zero per-step HBM gathers/scatters.

    The stream's big-endian words are reshaped into G-word groups
    (:func:`dec_group` sizes G so a whole block plus alignment slack fits
    in 2G words) and adjacent groups concatenate into (m-1, 2G) rows; each
    block fetches the single row of its start group — XLA TPU gather cost
    scales with the number of indices, so this beats the per-group scheme
    ~8x (0.07 vs 0.58 ms at 49k blocks).  The kernel discards the in-row
    bit phase and trims to :func:`dec_weff` rows in VMEM.
    """
    from ..ops import pallas_kernels as PK
    G = dec_group(L, max_block_bytes)
    we = dec_weff(L, max_block_bytes, G)
    gb = 4 * G                                  # bytes per group
    nbytes = stream.shape[0] * (4 if stream.dtype != jnp.uint8 else 1)
    # Zero-pad so every gathered row is in range (zeros decode as EOB —
    # never reached, blocks end at their own EOB).  All shapes static.
    nw = (nbytes // gb + 2) * G
    tbl = _be_word_table(stream, nbytes, nw).reshape(-1, G)
    tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)   # (m-1, 2G)
    s32 = starts.astype(jnp.int32)
    n = s32.shape[0]
    # The lockstep kernel pays each tile's LONGEST block: sorting blocks by
    # stream length makes tiles homogeneous.  But the sort costs a second
    # N-index row gather (the unpermute) — ~0.5 ms at 4 MP — so it only
    # pays on heterogeneous content; the HOST decides from the scan's
    # lengths (:func:`sort_pays_off`) and keys the compiled program.
    order = None
    if sort and n > PK.DEC_TILE:
        end = (jnp.asarray(total_len, jnp.int32) if total_len is not None
               else jnp.int32(nbytes))
        lens = jnp.diff(s32, append=end)
        order = jnp.argsort(lens)
        s32 = jnp.take(s32, order)
    rows = tbl_ov[s32 // gb]                    # (n, 2G), 1 index per block
    phase = ((s32 % gb) * 8)[:, None]
    lv = PK.decode_stream_rows(rows, phase, L, weff=we)
    if order is None:
        return lv
    inv = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return jnp.take(lv, inv, axis=0)


def max_block_bytes_of(starts: np.ndarray, total_len: int) -> int:
    """Longest block stream in bytes, from scan offsets (host side)."""
    starts = np.asarray(starts)
    if starts.size == 0:
        return 0
    ends = np.append(starts[1:], total_len)
    return int((ends - starts).max())


def decode_stream(stream_u8, starts, L: int, max_block_bytes: int = 0,
                  sort: bool = True, total_len=None):
    """Block-parallel device decode: (stream bytes, block start offsets) ->
    (N, L) int32 levels.

    ``stream_u8`` may instead be int32 little-endian words
    (:func:`host_stream_arg`): host-uploaded streams take that form so the
    device skips the expensive u8 -> u32 bitcast relayout.
    ``max_block_bytes`` (static) tightens the per-block word-row width on
    the Pallas path — the host scan knows the longest block, and the HBM
    gather cost scales with N x width.  0 = worst case (always safe).
    ``sort`` (static) selects the length-sorted tile layout; hosts that
    know the block lengths pass :func:`sort_pays_off` — homogeneous bands
    skip the unpermute gather (~0.5 ms at 4 MP).  True (always safe) is
    never wrong by more than that constant.  ``total_len`` (traced scalar,
    optional) is the TRUE stream byte length; the sort keys the last
    block's length against it instead of the padded buffer end.

    The serial part of decode — finding where each block's bitstream starts
    — happens host-side in one O(bytes) scan (entropy.scan_offsets), which
    also validates the stream.  On device every block then advances in
    lockstep, one code per step:

    * The stream is pre-expanded once into per-byte 32-bit MSB-first windows
      (four shifted adds, no gather), so each step reads its code with a
      single gather.
    * Steps RECORD each decoded (position, amplitude) pair into dense
      (step, block) arrays — a contiguous dynamic-update-slice per step —
      instead of scattering into the (N, L) output, which XLA serializes
      badly on TPU (measured 126 ms for a 4 MP image vs ~1 ms this way).
    * The loop is a while_loop that exits when every block has hit EOB, so
      sparse content pays for its own code count, not the worst case
      (L + L//15 + 2 steps).
    * Recorded positions are nondecreasing per block (runs only advance), so
      the final (N, L) assembly is a scatter-free vmapped binary search over
      the record axis.
    """
    n = starts.shape[0]
    is_words = stream_u8.dtype != jnp.uint8
    nbytes = stream_u8.shape[0] * (4 if is_words else 1)
    if nbytes * 8 >= _CAP_BITS:
        raise ValueError(
            f"{nbytes}-byte stream exceeds the device decoder's int32 "
            f"bit-position range (~256 MiB); decode in smaller chunks")
    if _pallas_decode_enabled():
        return _decode_stream_pallas(stream_u8, starts, L, max_block_bytes,
                                     sort=sort, total_len=total_len)
    if is_words:
        # XLA fallback reads per byte: unpack words to bytes.  LE words
        # (int32, host_stream_arg) bitcast directly on LE hosts; BE words
        # (uint32, emit="words" encode) byteswap first.
        x = stream_u8.astype(jnp.uint32)
        if stream_u8.dtype == jnp.uint32:
            x = ((x << 24) | ((x & 0xFF00) << 8)
                 | ((x >> 8) & 0xFF00) | (x >> 24))
        stream_u8 = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)
    max_steps = L + L // MAX_RUN + 2

    # Per-byte big-endian 32-bit windows: w32[i] = bytes[i..i+4) (zero pad).
    p = jnp.concatenate([stream_u8.astype(jnp.uint32),
                         jnp.zeros(3, jnp.uint32)])
    w32 = ((p[:-3] << 24) | (p[1:-2] << 16) | (p[2:-1] << 8) | p[3:])

    def cond(carry):
        step, _, _, done, _, _ = carry
        return (step < max_steps) & ~jnp.all(done)

    def body(carry):
        step, pos, widx, done, wts, amps = carry
        active = ~done
        win = w32[jnp.minimum(pos >> 3, nbytes - 1)] << (pos & 7).astype(
            jnp.uint32)
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
        # Record row: decoded position (or the L sentinel) + amplitude.
        zero = jnp.int32(0)
        wts = jax.lax.dynamic_update_slice(
            wts, jnp.where(store, wt, jnp.int32(L))[None], (step, zero))
        amps = jax.lax.dynamic_update_slice(
            amps, jnp.where(store, amp, 0)[None], (step, zero))
        widx = jnp.where(active & is_chain, widx + MAX_RUN,
                         jnp.where(store, wt + 1, widx))
        adv = jnp.where(is_eob | is_chain, 8, 8 + size)
        newpos = pos + adv
        newpos = jnp.where(is_eob, (newpos + 7) & ~jnp.int32(7), newpos)
        pos = jnp.where(active, newpos, pos)
        done = done | (active & is_eob)
        return step + 1, pos, widx, done, wts, amps

    # Derive every carry init from the inputs so its "varying manual axes"
    # match the body outputs under shard_map (constants created here are
    # unvarying, while the body mixes in the sharded stream/starts; adding
    # a zero of the varying `starts` tags the init without changing it).
    v0 = starts.astype(jnp.int32) * 0
    init = (jnp.int32(0),
            starts.astype(jnp.int32) * 8,
            v0,
            v0 != 0,
            jnp.full((max_steps, n), L, jnp.int32) + v0[None, :],
            jnp.zeros((max_steps, n), jnp.int32) + v0[None, :])
    _, _, _, _, wts, amps = jax.lax.while_loop(cond, body, init)

    # (N, L) assembly: positions per block are nondecreasing except for the
    # L sentinels punched at non-store steps — repair with a running max
    # (the sentinel simply carries the last real position; its amplitude is
    # 0 so a duplicate hit contributes nothing when searched from the left).
    wtsT = jax.lax.associative_scan(jnp.maximum,
                                    jnp.where(wts == L, -1, wts),
                                    axis=0).T     # (N, S) nondecreasing < L
    ampsT = amps.T
    q = jnp.arange(L, dtype=jnp.int32)[None, :]   # (1, L) queries
    # First index with wtsT[row, idx] >= q: explicit fixed-depth binary
    # search (log2(S) take_along_axis rounds) — tiny, predictable HLO,
    # unlike vmapped jnp.searchsorted.
    n_rows = wtsT.shape[0]
    lo = jnp.zeros((n_rows, L), jnp.int32)        # invariant: wts[lo-1] < q
    hi = jnp.full((n_rows, L), max_steps, jnp.int32)   # wts[hi] >= q (virtual)
    steps_pow2 = max(1, (max_steps).bit_length())
    for _ in range(steps_pow2):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(wtsT, jnp.minimum(mid, max_steps - 1), axis=1)
        below = v < q
        lo = jnp.where(below, mid + 1, lo)
        hi = jnp.where(below, hi, mid)
    idx = jnp.minimum(hi, max_steps - 1)
    hit = jnp.take_along_axis(wtsT, idx, axis=1) == q
    return jnp.where(hit, jnp.take_along_axis(ampsT, idx, axis=1), 0)


def encode_stream_chunks(levels):
    """(N, L) levels -> (bufs (C, chunk_worst) u8, blk_bytes (N,) int32).

    Self-chunking wrapper over :func:`encode_stream`: block batches whose
    worst-case output would overflow int32 bit positions split into C equal
    chunks (block boundaries are byte-aligned, so per-chunk streams
    concatenate into exactly the one-shot stream).  The tail chunk pads with
    all-zero blocks; each encodes to one EOB byte sitting AFTER the real
    blocks' bytes in that chunk's buffer, so pulling only the real blocks'
    byte total drops them.  jit-safe: C is static from the input shape.
    """
    n_blocks, L = levels.shape
    m = max_chunk_blocks(L)
    if n_blocks <= m:
        buf, blk_bytes = encode_stream(levels)
        return buf[None, :], blk_bytes
    c = -(-n_blocks // m)
    pad = c * m - n_blocks
    if pad:
        levels = jnp.concatenate(
            [levels, jnp.zeros((pad, L), levels.dtype)], axis=0)
    bufs, bbs = [], []
    for i in range(c):
        buf, bb = encode_stream(levels[i * m:(i + 1) * m])
        bufs.append(buf)
        bbs.append(bb)
    return jnp.stack(bufs), jnp.concatenate(bbs)[:n_blocks]


def assemble_chunks(bufs: "jax.Array", blk_bytes, chunk_blocks: int) -> bytes:
    """Host-side stitch of encode_stream_chunks output into stream bytes.

    ``chunk_blocks`` must be the cap the encoder traced with (pass the same
    value used to build the program — deriving it from shapes is ambiguous).
    Pulls only each chunk's used prefix (one transfer per chunk; C is 1 for
    everything under the int32 ceiling).
    """
    from ..utils.device import pull_prefix
    blk_bytes = np.asarray(blk_bytes)
    m = chunk_blocks
    parts = []
    for i in range(bufs.shape[0]):
        used = int(blk_bytes[i * m:(i + 1) * m].sum())
        parts.append(pull_prefix(bufs[i], used))
    return b"".join(parts)


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
