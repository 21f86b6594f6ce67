"""On-device boundary scan: find every block's start offset WITHOUT the host.

The boundary scan is the last serial O(bytes) stage of decode (the reference
parses the stream one code at a time, rle_byte_stream.py:74-88; our host
scanners in entropy/native/entropy.cpp and entropy/numpy_codec.py do the
same walk faster).  Block b+1's start depends on where block b ends, so the
chain looks irreducibly serial — but every block's bitstream is byte-aligned
(reference rle_byte_stream.py:54-56), which makes the set of possible block
starts small enough to brute-force:

1.  **Speculative per-byte parse** — for EVERY byte position q, a walker
    simulates the serial scan of "the block that starts at q": reads the
    4-bit run / 4-bit size header at its current bit position, advances
    (EOB -> pad to byte boundary and stop; 0xF0 zeros-chain -> +8 bits;
    code -> +8+size bits), tracks the coefficient index, and flags the same
    malformations the host scanner rejects (truncated stream, (run,0) with
    run not in {0,15}, coefficient index overflow, no EOB within the unit
    budget).  All walkers advance in lockstep — one vectorized step per
    unit, at most ``L + L//15 + 2`` steps (the host scanner's own bound).
    Result: ``E[q]`` = end byte of the block starting at q, or an absorbing
    ERR sentinel.

2.  **Wavefront join by pointer doubling** — the true starts are the orbit
    of 0 under E: ``s_0 = 0, s_{b+1} = E[s_b]``.  Squaring the table
    (``T <- T[T]``) doubles the orbit prefix per round, so ``num_blocks``
    starts materialize in ``ceil(log2(num_blocks+1))`` gathers.

3.  **One-scalar validation** — ERR is absorbing and E[q >= n] = ERR, so
    the stream is well-formed iff the orbit's element ``num_blocks`` equals
    exactly ``n_bytes`` (every earlier anomaly — mid-stream error, early
    termination, trailing bytes — propagates into that single comparison).
    The walk from a true start replays the host scanner's trajectory
    bit-for-bit, so when ``ok`` holds, the starts are exact by
    construction; when it doesn't, the caller reruns the host scanner to
    raise its canonical error.

Phase 1 has two implementations: a Mosaic funnel-shift walker
(ops/pallas_kernels.py:_scan_walk_kernel — each byte position gets a lane
column fed by the same overlap-table row gather as the decode kernel, so
the per-unit HBM gather of the XLA formulation disappears; measured 156 ms
-> ~4 ms per 340 KB band) used whenever the Pallas path is enabled, and the
original static-shaped gather+elementwise XLA walk as the portable
fallback.  Phase 2/3 are gather + elementwise XLA everywhere.  Opt in with
``JPEG_TPU_DEVICE_SCAN=1`` (see :func:`scan_offsets_hybrid`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_RUN = 15


def _max_units(L: int) -> int:
    # Host scanners' per-block unit budget (numpy_codec.scan_offsets).
    return L + L // MAX_RUN + 2


def _worst_span(L: int) -> int:
    """Worst-case bytes a walker can consume: a GARBAGE walker (mid-block
    byte) can eat up to L codes (each advances the coefficient index) of
    23 bits plus L//15 + 1 unchecked zero-chains plus the EOB byte and
    pad."""
    return (23 * L + 8 * (L // MAX_RUN + 1) + 8 + 7) // 8


def _scan_geometry(L: int, span_cap: int = 0):
    """(G, Weff, span) for the walker kernel's overlap-row gather.

    ``span_cap`` > 0 trims the per-walker window below the worst case:
    walkers consuming more than ``span_cap`` bytes hit the rem cap and
    absorb to ERR, which is always SAFE (the orbit validation fails and
    the caller escalates to a wider rung) — phase-1 shift cost and the
    row-gather width both scale with the span, and real blocks are far
    shorter than the garbage-walker worst case."""
    from .device_codec import _DEC_G_BUCKETS
    span = _worst_span(L)
    if span_cap > 0:
        span = min(span, span_cap)
    need = (span + 2) // 4
    G = None
    for g in _DEC_G_BUCKETS:
        if need <= g:
            G = g
            break
    if G is None:
        G = _DEC_G_BUCKETS[-1]
        while need > G:
            G *= 2
    we = min(-(-span // 4) + 1, 2 * G)
    return G, we, span


# MEASURED NEGATIVE RESULT (round 5, benchmarks/probes/probe_foreign.py +
# the settle-step simulation in probes/README.md): a two-sweep split —
# cap every walker at ~12 units (the mean settles in ~6 while a
# 1024-column tile's lockstep max is ~27), then resume only the ~13%
# survivors — CANNOT be made profitable on TPU.  Survivors are uniformly
# spread (every 256-column tile contains one even at cap 20), so the
# resume sweep needs a genuine compaction, and every fixed-shape
# compaction primitive (jnp.nonzero(size=K), .at[idx].set) lowers to a
# serialized TPU scatter: the two-sweep measured 50.8 ms vs 21.9 ms
# single-sweep for a 1.4 MB stream.  The ~4.7x lockstep-sync waste is
# therefore a structural floor of the speculative per-byte formulation;
# combined with its P x tile-max work multiplier it lands ~3-4x above
# the serial C++ scan (3.8 vs ~14 ms/MB) — the device scan's value is
# host-freedom (one-dispatch foreign decode; ~100x over the pure-Python
# scanner when no compiler exists), not beating the native scanner.  The
# walker kernel keeps its cap/resume parameters (tested) for a future
# backend where compaction is cheap.


def _walker_table_pallas(stream, P: int, nbits, L: int, span_cap: int = 0):
    """Phase 1 via the Mosaic walker: E[q] = end byte of the block starting
    at byte q (ERR sentinel P+1 for malformed/garbage/past-the-end — and,
    when ``span_cap`` trims the window, for any walker consuming more)."""
    from ..ops import pallas_kernels as PK
    from .device_codec import _be_word_table
    G, we, span = _scan_geometry(L, span_cap)
    gb = 4 * G
    nw = (P // gb + 2) * G
    tbl = _be_word_table(stream, P, nw).reshape(-1, G)
    tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)
    q = jnp.arange(P, dtype=jnp.int32)
    rows = tbl_ov[q // gb]
    phase = ((q % gb) * 8)[:, None]
    rem = (nbits.astype(jnp.int32) - q * 8)[:, None]
    if span < _worst_span(L):
        # Trimmed window: walkers needing more than span bytes must ERR
        # (never read zeros shifted in past the row) — cap the bits they
        # are allowed to consume at what the row provably covers.
        rem = jnp.minimum(rem, jnp.int32(8 * span))
    ERR = jnp.int32(P + 1)
    blen = PK.scan_walk_rows(rows, phase, rem, L, weff=we)
    return jnp.where(blen >= 0, q + blen, ERR)


def _end_table(stream, n_bytes, L: int, span_cap: int = 0):
    """Phase 1 for a padded stream buffer: (E over [0, P+1], ERR).

    ``E[q]`` = end byte of the block starting at byte q, or the absorbing
    ERR sentinel (P+1); ``n_bytes`` (traced) is the true buffer length for
    truncation detection."""
    from .device_codec import _pallas_decode_enabled
    is_words = stream.dtype != jnp.uint8
    P = stream.shape[0] * (4 if is_words else 1)
    ERR = jnp.int32(P + 1)
    nbits = n_bytes.astype(jnp.int32) * 8

    if _pallas_decode_enabled():
        return jnp.concatenate([
            _walker_table_pallas(stream, P, nbits, L, span_cap),
            jnp.full(2, ERR, jnp.int32)]), ERR
    return _end_table_xla(stream, P, nbits, L, span_cap), ERR


@functools.partial(jax.jit, static_argnames=("num_blocks", "L", "span_cap"))
def scan_table_and_starts(stream, n_bytes, num_blocks: int, L: int,
                          span_cap: int = 0):
    """(padded stream bytes, true length) -> (starts (num_blocks,) i32, ok).

    ``stream`` is the zero-padded stream — uint8 bytes, or int32
    little-endian words (device_codec.host_stream_arg) on the Pallas path —
    of static byte size P >= n_bytes; ``n_bytes`` is the true length
    (traced scalar).  ``ok`` is a scalar bool; ``starts`` is meaningful
    only when ``ok`` is True.
    """
    E, ERR = _end_table(stream, n_bytes, L, span_cap)
    return _orbit_starts(E, n_bytes, num_blocks, ERR)


def scan_bands_starts(stream, ends, num_blocks: int, L: int,
                      span_cap: int = 0):
    """In-program multi-band scan: ONE walker table over the concatenated
    band streams, then one orbit chase per band from its start offset.

    ``ends`` is the (B,) int32 cumulative band end offsets (band b occupies
    bytes [ends[b-1], ends[b])); every band has ``num_blocks`` blocks.
    Returns ``(starts (B*num_blocks,) i32, ok)`` — ok only when EVERY
    band's orbit lands exactly on its end offset.  E is monotonic
    (E[q] > q), so a band whose parse would consume the next band's bytes
    overshoots its end and fails the per-band check; composable inside a
    larger jit (api._decode3_foreign_fn fuses this with the bit parse and
    the coefficient decode into ONE dispatch).
    """
    from ..ops import pallas_kernels as PK
    from .device_codec import _pallas_decode_enabled
    E, ERR = _end_table(stream, ends[-1], L, span_cap)
    B = ends.shape[0]
    nbp = -(-max(num_blocks, 1) // 128) * 128
    # VMEM budget charges the E table AND the kernel's (nbp/128, B, 128)
    # packed-starts block — at B=3 the out block is 3x the single-chase
    # kernel's, and an E that barely fit alone would oversubscribe.
    if (_pallas_decode_enabled() and num_blocks > 0
            and 4 * E.shape[0] + 4 * B * nbp <= PK.CHASE_VMEM_CAP):
        # All B orbits advance in ONE serial kernel loop (sublane-parallel
        # chains): nb steps instead of B*nb across separate chase calls.
        s0s = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               ends[:-1].astype(jnp.int32)])
        starts, oks = PK.chase_starts_multi(E, ends, s0s, num_blocks)
        return starts.reshape(-1), jnp.all(oks)
    # Pointer-doubling fallback, squaring HOISTED across bands: the
    # T <- T[T] ladder (the dominant P*log2(nb) gather cost out here) is
    # independent of the start offset, so all B orbits share one ladder.
    rounds = max(1, int(np.ceil(np.log2(num_blocks + 1))))
    nb_pad = 1 << rounds
    s0s = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           ends[:-1].astype(jnp.int32)])
    orbit = jnp.zeros((B, nb_pad), jnp.int32).at[:, 0].set(s0s)
    T = E
    filled = 1
    for _ in range(rounds):
        nxt = T[orbit[:, :filled]]            # (B, filled)
        orbit = jax.lax.dynamic_update_slice(orbit, nxt, (0, filled))
        if 2 * filled < nb_pad:               # last squaring is unused
            T = T[T]
        filled *= 2
    starts = orbit[:, :num_blocks]
    endb = E[jnp.minimum(starts[:, num_blocks - 1], ERR)]
    ok = jnp.all(endb == ends.astype(jnp.int32))
    return starts.reshape(-1), ok


def _end_table_xla(stream, P: int, nbits, L: int, span_cap: int = 0):
    """Portable phase-1 fallback: static-shaped gather+elementwise walk.

    ``span_cap`` enforces the same per-walker byte-window certificate as
    the Mosaic path (callers size decode geometry from an ok at a rung,
    so the rung MUST bound block length on every branch): walkers that
    would consume more than ``span_cap`` bytes absorb to ERR."""
    is_words = stream.dtype != jnp.uint8
    ERR = jnp.int32(P + 1)
    if is_words:
        stream = jax.lax.bitcast_convert_type(
            stream.astype(jnp.uint32), jnp.uint8).reshape(-1)
    # 16-bit big-endian windows: any 8-bit header at bit position p lives in
    # w16[p >> 3] >> (8 - (p & 7)).  One shift+or pass, no per-step packing.
    b = jnp.concatenate([stream.astype(jnp.int32),
                         jnp.zeros(1, jnp.int32)])
    w16 = (b[:-1] << 8) | b[1:]

    # --- Phase 1: every byte is a candidate block start -------------------
    def step(st):
        it, pos, widx, done, err = st
        live = ~(done | err)
        trunc_hdr = pos + 8 > limit
        h = (w16[jnp.minimum(pos >> 3, P - 1)]
             >> (8 - (pos & 7))) & 0xFF
        run = h >> 4
        size = h & 0xF
        is_eob = h == 0
        is_chain = h == 0xF0
        is_code = size != 0
        bad_code = ~is_code & ~is_eob & ~is_chain
        trunc_code = is_code & (pos + 8 + size > limit)
        overflow = is_code & (widx + run >= L)
        new_err = live & (trunc_hdr | bad_code | trunc_code | overflow)

        adv = jnp.where(is_code, 8 + size, 8)
        npos = pos + adv
        npos = jnp.where(is_eob, (npos + 7) & ~jnp.int32(7), npos)
        nwidx = widx + jnp.where(is_chain, MAX_RUN,
                                 jnp.where(is_code, run + 1, 0))
        upd = live & ~new_err
        return (it + 1,
                jnp.where(upd, npos, pos),
                jnp.where(upd, nwidx, widx),
                done | (upd & is_eob),
                err | new_err)

    def not_settled(st):
        # Early exit once every walker hit EOB or an error: sparse streams
        # (short blocks) pay their own unit count, not the worst case.
        it, _, _, done, err = st
        return (it < _max_units(L)) & ~jnp.all(done | err)

    pos0 = jnp.arange(P, dtype=jnp.int32) * 8
    # Per-walker bit budget: the stream end, and (when the rung trims the
    # window) span_cap bytes from the walker's own start — the same
    # semantics as the Mosaic walker's rem clamp.
    limit = (jnp.minimum(nbits, pos0 + 8 * span_cap) if span_cap > 0
             else nbits)
    z = jnp.zeros(P, jnp.int32)
    _, pos, _, done, err = jax.lax.while_loop(
        not_settled, step, (jnp.int32(0), pos0, z, z != 0, z != 0))
    # E over the extended domain [0, P+1]: q=P (start at/after stream end)
    # and the ERR state itself both absorb to ERR.
    return jnp.concatenate([
        jnp.where(done & ~err, pos >> 3, ERR),
        jnp.full(2, ERR, jnp.int32)])


def _orbit_starts(E, n_bytes, num_blocks: int, ERR, s0=None):
    """Phases 2 + 3: orbit of ``s0`` (default 0) under the end-table E,
    plus the single-scalar stream validation (end == ``n_bytes``).

    Two implementations: a VMEM-resident serial chase kernel
    (ops/pallas_kernels.py:_chase_kernel) whenever Pallas is enabled and E
    fits VMEM — pointer chasing is latency-bound, so nb register-speed
    steps beat P*log2(nb) HBM gather work (measured 49 ms -> ~2 ms for a
    0.5 MB table) — and the pointer-doubling square-and-gather join as the
    portable/large-stream fallback."""
    from ..ops import pallas_kernels as PK
    from .device_codec import _pallas_decode_enabled
    nbp = -(-max(num_blocks, 1) // 128) * 128
    if (_pallas_decode_enabled() and num_blocks > 0
            and 4 * E.shape[0] + 4 * nbp <= PK.CHASE_VMEM_CAP):
        return PK.chase_starts(E, n_bytes, num_blocks, s0=s0)
    rounds = max(1, int(np.ceil(np.log2(num_blocks + 1))))
    nb_pad = 1 << rounds
    orbit = jnp.zeros(nb_pad, jnp.int32)          # orbit[0] = s_0
    if s0 is not None:
        orbit = orbit.at[0].set(jnp.asarray(s0, jnp.int32))
    T = E
    filled = 1
    for _ in range(rounds):
        nxt = T[orbit[:filled]]                   # s_{filled..2*filled-1}
        orbit = jax.lax.dynamic_update_slice(orbit, nxt, (filled,))
        if 2 * filled < nb_pad:                   # last squaring is unused
            T = T[T]
        filled *= 2
    starts = orbit[:num_blocks]
    # s_{num_blocks}: one more application of E to the last start.
    end = E[jnp.minimum(starts[num_blocks - 1], ERR)] if num_blocks else \
        jnp.int32(0)
    ok = end == n_bytes.astype(jnp.int32)
    return starts, ok


# Walker-window rungs (bytes a walker may consume), aligned to the
# _DEC_G_BUCKETS row widths: need=(span+2)//4 -> G in {16, 32}.  Blocks
# longer than the rung absorb to ERR and the scan escalates; the last
# rung is always the worst-case span (exact host semantics).  Per-L cache
# of the last rung that succeeded, so steady-state streams pay one scan.
# The 46-byte rung shares G=16 with 62 but trims the walkers' funnel
# buffer 17 -> 13 rows — phase-1 cost is ~linear in that width, and
# typical photographic blocks are well under 46 bytes.
_SPAN_RUNGS = (46, 62, 126)
_rung_cache: dict = {}


def span_rungs(L: int):
    """Walker-window escalation ladder for dct area L (0 = worst case)."""
    return [s for s in _SPAN_RUNGS if s < _worst_span(L)] + [0]


# Measured on this container (2026-08-20, benchmarks/probes/probe_foreign
# .py): the pure-Python word-window scanner runs ~0.9-1.1 MB/s while the
# fused device scan+decode adds ~13 ms/MB of marginal device time — so
# once a stream passes a few tens of KB the walker wins by >50x.  Below
# the threshold the (tunnel-dependent) dispatch constant dominates either
# way and the host path avoids compiling a second program family.
PY_SCAN_DEVICE_MIN_BYTES = 1 << 16


def scan_mode(n_bytes: int = 1 << 30) -> str:
    """Boundary-scan policy for foreign streams: 'host' or 'device'.

    Replaces the old raw JPEG_TPU_DEVICE_SCAN opt-in flag with a measured
    auto policy; `JPEG_TPU_SCAN=host|device` still forces either side (and
    the legacy flag keeps meaning 'device').

    Auto: the C++ host scanner measured ~3x the Mosaic walker's
    throughput (1.66 vs 5.50 ms on 407 KB, docs/ROUND4.md item 3) AND
    runs off the device, so it stays the default whenever it exists.
    Without a compiler the host alternative is the pure-Python scanner
    (~1 MB/s): the device scan wins past PY_SCAN_DEVICE_MIN_BYTES.
    """
    import os
    v = os.environ.get("JPEG_TPU_SCAN", "").lower()
    if v in ("host", "device"):
        return v
    if os.environ.get("JPEG_TPU_DEVICE_SCAN"):       # legacy alias
        return "device"
    from .device_codec import _pallas_decode_enabled
    if not _pallas_decode_enabled():
        return "host"
    from .. import entropy as E
    if E._get_native() is not None:
        return "host"
    return "device" if n_bytes >= PY_SCAN_DEVICE_MIN_BYTES else "host"


def scan_offsets_device(data: bytes, num_blocks: int, L: int):
    """Host wrapper: run the device scan on ``data``.

    Returns ``(starts int32 ndarray, ok bool)``.  Mirrors the host
    scanners' trivial cases exactly; for everything else the device
    program decides.  Does NOT raise on malformed streams — callers fall
    back to the host scanner for its canonical error (scan_offsets_hybrid).
    """
    from ..utils.device import quarter_cap
    from .device_codec import _pallas_decode_enabled, host_stream_arg

    n = len(data)
    if num_blocks == 0:
        return np.zeros(0, np.int32), n == 0
    if n == 0:
        return np.zeros(num_blocks, np.int32), False
    # Quarter-octave padding: every padded byte is a walker, so the pow2
    # cap's up-to-2x padding would be up-to-2x phase-1 work.
    pad = quarter_cap(n)
    arr = np.zeros(pad, np.uint8)
    arr[:n] = np.frombuffer(data, np.uint8)
    stream = jnp.asarray(host_stream_arg(arr))
    rungs = span_rungs(L)
    if not _pallas_decode_enabled():
        rungs = [0]          # the XLA walk gains nothing from a trimmed
        #                      window (no row funnel), so skip the ladder
    first = min(_rung_cache.get(L, 0), len(rungs) - 1)
    for i in range(first, len(rungs)):
        starts, ok = scan_table_and_starts(
            stream, jnp.int32(n), num_blocks, L, span_cap=rungs[i])
        if ok:
            _rung_cache[L] = i
            return np.asarray(starts), True
    return np.asarray(starts), False


def scan_offsets_hybrid(data: bytes, num_blocks: int, L: int) -> np.ndarray:
    """Device scan with host fallback: exact drop-in for
    ``entropy.scan_offsets`` (same result, same errors).

    Valid stream -> device-computed starts.  Anything malformed fails the
    device program's single ``ok`` check, and the host scanner reruns to
    raise its canonical error.
    """
    starts, ok = scan_offsets_device(data, num_blocks, L)
    if ok:
        return starts
    host = _host_scan(data, num_blocks, L)             # expected to raise
    import warnings
    warnings.warn(
        "device scan rejected a stream the host scanner accepts — "
        "falling back to host starts (please report)", RuntimeWarning,
        stacklevel=2)
    return host


def _host_scan(data: bytes, num_blocks: int, L: int) -> np.ndarray:
    """The host scanner backends directly (NOT entropy.scan_offsets, which
    may route back here when JPEG_TPU_DEVICE_SCAN is set)."""
    from .. import entropy as E
    nat = E._get_native()
    if nat is not None:
        return nat.scan_offsets(data, num_blocks, L)
    from . import numpy_codec
    return numpy_codec.scan_offsets(data, num_blocks, L)
