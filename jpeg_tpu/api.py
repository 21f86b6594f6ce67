"""Public codec API: band-level and image-level compress/decompress.

Mirrors the reference surface (pipeline/__init__.py:71-124): ``compress_band``
/ ``decompress_band`` operate on single planes; :class:`Jpeg` splits an image
into Y/Cb/Cr bands, compresses each independently with the same config, and
packs the container.  PIL appears only at the image edges; the core works on
arrays.
"""
from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import container, entropy
from .config import BadRleCodeError, Configuration, QuantizationMethod  # re-export
from .container import CompressedData
from .ops import band as _band
from .ops.band import decode_band_levels, encode_band_levels


def compress_band(a, config: Configuration, dtype=None) -> bytes:
    """(H, W) integer band -> entropy-coded bytestream."""
    levels = encode_band_levels(a, config, dtype=dtype)
    return entropy.encode_levels(np.asarray(levels))


def decompress_band(data: bytes, config: Configuration, dtype=None) -> np.ndarray:
    """Band bytestream -> (H, W) int reconstruction."""
    levels = entropy.decode_levels(bytes(data), config.num_blocks,
                                   config.dct_size ** 2)
    return np.asarray(decode_band_levels(levels, config, dtype=dtype))


@functools.lru_cache(maxsize=None)
def _encode3_fn(key, dtype_name: str, use_pallas: bool):
    """One jitted call transforming all 3 bands: (3, H, W) -> (3, N, L) i16.

    A single device launch + a single device->host pull per image instead of
    three — launch latency and transfer setup dominate small/medium images.
    Levels are shipped as int16 (any representable stream has |amp| <= 16383,
    reference util.py:162-174) with a device-computed max |level| so the host
    can reject unrepresentable streams before the narrowing loses anything.
    """
    enc = _band.make_encode_batch(key, dtype_name, use_pallas)

    def f(bands):
        levels = enc(bands)
        mx = jnp.max(jnp.abs(levels))
        return levels.astype(jnp.int16), mx.astype(jnp.int32)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _decode3_fn(key, dtype_name: str, use_pallas: bool):
    """(3, N, L) int16 levels -> (3, H, W) uint8 planes (one launch)."""
    dec = _band.make_decode(key, dtype_name, use_pallas)

    def f(levels16):
        planes = jax.vmap(dec)(levels16.astype(jnp.int32))
        return planes.astype(jnp.uint8)   # already clamped to [0, 255]

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _encode3_stream_fn(key, dtype_name: str, use_pallas: bool):
    """Fully-device encode: (3, H, W) -> (stream bytes, band lengths, max).

    The entropy bitstream is assembled on device (entropy/device_codec.py),
    so the only device->host traffic is the compressed bytes themselves —
    typically 5-40x smaller than the coefficient levels.
    """
    from .entropy import device_codec as DC
    enc = _band.make_encode_batch(key, dtype_name, use_pallas)

    def f(bands):
        levels = enc(bands)                            # (3, N, L)
        flat = levels.reshape(-1, levels.shape[-1])
        return DC.encode_bands_stream(flat, 3)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _encode3_levels_stats_fn(key, dtype_name: str, use_pallas: bool):
    """Phase 1 of the content-sized device encode: coefficient transform +
    stream geometry, levels kept device-resident.

    Returns (levels (3N, L) int32, stats (6,) int32 = [longest block bytes,
    total stream bytes, band0 bytes, band1 bytes, max |level|, min
    constraining merge-unit bytes]).  The host pulls only the 24-byte stats
    vector, buckets the entropy-encode shapes
    (entropy/device_codec.py:encode_words_bucket / encode_cap_bucket /
    gather_group_bucket) and dispatches phase 2 (:func:`_entropy_sized_fn`)
    — the funnel kernel, merges and the compaction gather then all run on
    content-proportional data instead of the 23-bit/coefficient worst case.
    """
    from .entropy import device_codec as DC
    enc = _band.make_encode_batch(key, dtype_name, use_pallas)

    def f(bands):
        levels = enc(bands)                            # (3, N, L)
        flat = levels.reshape(-1, levels.shape[-1])
        bb = DC.block_bytes_of(flat)
        band_bytes = jnp.sum(bb.reshape(3, -1), axis=-1)
        stats = jnp.stack([
            jnp.max(bb), jnp.sum(bb), band_bytes[0], band_bytes[1],
            jnp.max(jnp.abs(flat)), DC.min_unit_bytes_of(bb)]
        ).astype(jnp.int32)
        return flat, stats

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _entropy_sized_fn(W: int, cap: int, G: int = 0):
    """Phase 2 of the content-sized device encode: (3N, L) levels ->
    cap-byte stream buffer at the bucketed row width W and gather group G."""
    from .entropy import device_codec as DC

    def f(flat):
        buf, _, bad = DC.encode_stream_sized(flat, W, cap, G)
        return buf, bad

    return jax.jit(f)


def _sized_entropy_enabled(L: int = 0) -> bool:
    from .entropy import device_codec as DC
    return DC.sized_entropy_default(L)


@functools.lru_cache(maxsize=None)
def _encode3_stream_chunked_fn(key, dtype_name: str, use_pallas: bool,
                               chunk_blocks: int):
    """Device encode for batches past the int32 bit-position ceiling:
    (3, H, W) -> (chunk buffers, per-block bytes, band lengths, max).

    ``chunk_blocks`` keys the cache so a changed cap retraces."""
    from .entropy import device_codec as DC
    enc = _band.make_encode_batch(key, dtype_name, use_pallas)

    def f(bands):
        levels = enc(bands)                            # (3, N, L)
        flat = levels.reshape(-1, levels.shape[-1])
        bufs, blk_bytes = DC.encode_stream_chunks(flat)
        band_bytes = jnp.sum(blk_bytes.reshape(3, -1), axis=-1)
        mx = jnp.max(jnp.abs(flat)).astype(jnp.int32)
        return bufs, blk_bytes, band_bytes, mx

    return jax.jit(f)


from .utils.device import pull_prefix as _pull_prefix  # shared helper


@functools.lru_cache(maxsize=None)
def _decode3_stream_fn(key, dtype_name: str, use_pallas: bool,
                       nbytes_pad: int, max_bb: int = 0, sort: bool = True):
    """Fully-device decode: (stream bytes, block starts) -> (3, H, W) u8.

    The host does only the serial O(bytes) boundary scan; bit parsing, IDCT
    and clamping all run in one jitted program (entropy/device_codec.py).
    ``nbytes_pad`` is the power-of-two padded stream size (static shape);
    ``max_bb`` the longest block in bytes (0 = worst case), which sizes the
    decode word-row gather; ``sort`` selects the length-sorted tile layout
    (hosts pass DC.sort_pays_off over the scanned lengths).  ``total`` is
    the true stream byte length (traced: it only keys the sort)."""
    from .entropy import device_codec as DC
    h, w, bs, d, transform, qname, qparams = key
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                        transform=transform,
                        quantization=QuantizationMethod(qname, **dict(qparams)))
    L = d * d
    nb = cfg.num_blocks
    dec = _band.make_decode(key, dtype_name, use_pallas)

    def f(stream, starts, total):
        levels = DC.decode_stream(stream, starts, L, max_bb,
                                  sort=sort, total_len=total)  # (3*nb, L)
        planes = jax.vmap(dec)(levels.reshape(3, nb, L))
        return planes.astype(jnp.uint8)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _decode3_foreign_fn(key, dtype_name: str, use_pallas: bool,
                        nbytes_pad: int, span_cap: int):
    """ONE-dispatch host-free decode of a foreign stream: (padded stream
    bytes/words, band end offsets) -> ((3, H, W) u8 planes, ok).

    Scan + bit parse + dequant + IDCT + clamp in a single program — no
    host boundary scan at all (replacing the reference's serial parse,
    rle_byte_stream.py:60-88).  The walker-window rung ``span_cap`` sizes
    BOTH the scan (entropy/device_scan.py) and the decode word-row
    geometry: an ok result certifies every block fits the rung, so the
    decode gather runs at rung-sized rows instead of the worst case.  ok
    False (a block outlived the rung, or a malformed stream) means the
    planes are garbage — the host escalates to the next rung or falls
    back to the host-scan path for its canonical error.  Blocks are not
    length-sorted (lengths would cost a device argsort; foreign streams
    pay at most the unsorted tile penalty, ~0.3 ms at 4 MP)."""
    from .entropy import device_codec as DC
    from .entropy import device_scan as DS
    h, w, bs, d, transform, qname, qparams = key
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                        transform=transform,
                        quantization=QuantizationMethod(qname, **dict(qparams)))
    L = d * d
    nb = cfg.num_blocks
    dec = _band.make_decode(key, dtype_name, use_pallas)
    mb = DC.bucket_block_bytes(L, span_cap) if span_cap > 0 else 0

    def f(stream, ends):
        starts, ok = DS.scan_bands_starts(stream, ends, nb, L,
                                          span_cap=span_cap)
        levels = DC.decode_stream(stream, starts, L, mb, sort=False,
                                  total_len=ends[-1])
        planes = jax.vmap(dec)(levels.reshape(3, nb, L))
        return planes.astype(jnp.uint8), ok

    return jax.jit(f)


def _foreign_decode_lazy(config: Configuration, streams, dt, pal):
    """Dispatch the first-rung fused scan+decode WITHOUT syncing; return a
    zero-arg resolver that validates the in-program ok flag at pull time,
    escalating the rung ladder on rejection and falling back to the
    host-scan path (whose scanner raises the canonical error on malformed
    streams).  Deferring the ok sync keeps the main thread free to
    dispatch the next image — decompress_many's documented overlap."""
    from .entropy import device_codec as DC
    from .entropy import device_scan as DS
    from .utils.device import quarter_cap
    L = config.dct_size ** 2
    buf = b"".join(streams)
    # Quarter-octave padding: every padded byte is a walker (device_scan).
    pad = quarter_cap(len(buf))
    arr = np.zeros(pad, np.uint8)
    arr[:len(buf)] = np.frombuffer(buf, np.uint8)
    arr_dev = jax.device_put(DC.host_stream_arg(arr))
    ends = jnp.asarray(np.cumsum([len(s) for s in streams]).astype(np.int32))
    rungs = DS.span_rungs(L)
    if not DC._pallas_decode_enabled():
        # The XLA-fallback walker gains nothing from a trimmed window (no
        # row funnel), so every rung would compile an identical program
        # and a malformed stream would run the full scan per rung: go
        # straight to the exact worst-span program.
        rungs = [0]
    first = min(DS._rung_cache.get(L, 0), len(rungs) - 1)
    key = _band.config_key(config)
    fn = _decode3_foreign_fn(key, dt.name, pal, pad, rungs[first])
    planes, ok = fn(arr_dev, ends)                   # async dispatch

    def resolve():
        nonlocal planes, ok
        i = first
        while not bool(ok):                          # syncs THIS dispatch
            i += 1
            if i >= len(rungs):
                # Every rung rejected: the host scanner either raises the
                # canonical error or (never observed) recovers the starts.
                return _host_scan_decompress(config, streams, dt, pal)
            planes, ok = _decode3_foreign_fn(
                key, dt.name, pal, pad, rungs[i])(arr_dev, ends)
        DS._rung_cache[L] = i
        return planes

    return resolve


def _dt_and_pallas(config: Configuration, dtype):
    dt = np.dtype(dtype if dtype is not None else _band.default_dtype())
    pal = dt == np.float32 and _band.use_pallas_default(config.transform)
    return dt, pal


def _use_device_entropy() -> bool:
    from .utils.device import device_entropy_default
    return device_entropy_default()


def _start_compress(ycbcr: np.ndarray, config: Configuration, dt, pal):
    """Dispatch the device half of an image encode WITHOUT blocking.

    Returns an opaque state consumed by :func:`_finish_compress`.  JAX
    dispatch is asynchronous, so after this returns the upload + on-device
    compute proceed while the host does other work — the hook that lets
    :func:`compress_many` overlap image i's result pull with image i+1's
    transfer and compute.
    """
    ycbcr = np.asarray(ycbcr)
    if ycbcr.ndim != 3 or ycbcr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) YCbCr array, got {ycbcr.shape}")
    _band.check_band_shape(ycbcr[:, :, 0], config)
    planes = np.ascontiguousarray(ycbcr.transpose(2, 0, 1))
    from .entropy import device_codec as DC
    L = config.dct_size ** 2
    n_total = 3 * config.num_blocks
    if _use_device_entropy():
        if n_total <= DC.max_chunk_blocks(L):
            if _sized_entropy_enabled(L):
                fn = _encode3_levels_stats_fn(_band.config_key(config),
                                              dt.name, pal)
                return ("dev_sized", L, *fn(planes))
            fn = _encode3_stream_fn(_band.config_key(config), dt.name, pal)
            return ("dev", *fn(planes))
        # Worst-case output exceeds int32 bit positions: the encoder
        # self-chunks on device; byte-aligned blocks concatenate exactly.
        m = DC.max_chunk_blocks(L)
        fn = _encode3_stream_chunked_fn(_band.config_key(config),
                                        dt.name, pal, m)
        return ("dev_chunked", m, *fn(planes))
    fn = _encode3_fn(_band.config_key(config), dt.name, pal)
    return ("host", *fn(planes))


def _check_mx(mx) -> None:
    if int(mx) > entropy.MAX_AMP:
        raise BadRleCodeError(
            f"amplitude {int(mx)} exceeds the representable "
            f"{entropy.MAX_AMP}")


def _advance_compress(state, config: Configuration):
    """Advance a ``dev_sized`` state: pull the 20-byte stats (blocks only on
    phase 1), bucket the entropy-encode shapes and DISPATCH phase 2 without
    blocking on it.  :func:`compress_many` calls this one pipeline slot
    before the finish so the phase-2 program runs while the next image
    uploads — without it the sized path would serialize two device round
    trips per image inside :func:`_finish_compress`.  No-op for every other
    state kind; idempotent."""
    from .entropy import device_codec as DC
    if state[0] != "dev_sized":
        return state
    _, L, flat, stats = state
    max_bb, total, b0, b1, mx, min_unit = (int(x) for x in np.asarray(stats))
    _check_mx(mx)
    W = DC.encode_words_bucket(L, max_bb)
    cap = DC.encode_cap_bucket(
        total, flat.shape[0] * DC.worst_case_block_bytes(L))
    G = DC.gather_group_bucket(min_unit, flat.shape[0], W)
    buf_dev, bad = _entropy_sized_fn(W, cap, G)(flat)
    return ("dev_sized2", buf_dev, bad, total, b0, b1)


def _finish_compress(state, config: Configuration) -> bytes:
    """Block on a :func:`_start_compress` state and pack the container."""
    from .entropy import device_codec as DC
    kind = state[0]
    if kind == "dev_sized":
        state = _advance_compress(state, config)
        kind = state[0]
    if kind == "dev_sized2":
        _, buf_dev, bad, total, b0, b1 = state
        DC.check_sized_ok(bad)
        buf = _pull_prefix(buf_dev, total)
        bb = [b0, b1, total - b0 - b1]
        bands = [buf[sum(bb[:i]):sum(bb[:i + 1])] for i in range(3)]
        return container.generate_data(config, CompressedData(*bands))
    if kind == "dev":
        _, stream, band_bytes, mx = state
        _check_mx(mx)
        bb = [int(x) for x in np.asarray(band_bytes)]
        buf = _pull_prefix(stream, sum(bb))
        bands = [buf[sum(bb[:i]):sum(bb[:i + 1])] for i in range(3)]
    elif kind == "dev_chunked":
        _, m, bufs, blk_bytes, band_bytes, mx = state
        _check_mx(mx)
        bb = [int(x) for x in np.asarray(band_bytes)]
        buf = DC.assemble_chunks(bufs, blk_bytes, m)
        bands = [buf[sum(bb[:i]):sum(bb[:i + 1])] for i in range(3)]
    else:
        _, levels16, mx = state
        _check_mx(mx)
        levels = np.asarray(levels16)
        with ThreadPoolExecutor(max_workers=3) as pool:
            bands = list(pool.map(entropy.encode_levels, list(levels)))
    return container.generate_data(config, CompressedData(*bands))


def compress_ycbcr(ycbcr: np.ndarray, config: Configuration,
                   dtype=None) -> bytes:
    """(H, W, 3) uint8 YCbCr image -> container bytes.

    All three bands (including luma) go through the same subsample path,
    matching the reference (pipeline/__init__.py:102-110).
    """
    dt, pal = _dt_and_pallas(config, dtype)
    return _finish_compress(_start_compress(ycbcr, config, dt, pal), config)


def compress_many(images, config: Configuration, dtype=None,
                  depth: int = 2) -> list:
    """Pipelined encode of an iterable of (H, W, 3) YCbCr images.

    Keeps up to ``depth`` images in flight: while image i's compressed
    bytes stream back to the host, image i+1 is already uploading and
    transforming on the chip.  On transfer-bound links (PCIe, or the dev
    tunnel) this hides compute and one direction of transfer entirely;
    results are identical to per-image :func:`compress_ycbcr`.
    """
    from collections import deque
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    dt, pal = _dt_and_pallas(config, dtype)
    states: deque = deque()
    out = []
    # The result pull (_finish_compress) blocks on a d2h transfer; run it on
    # a single worker so the main thread keeps uploading/dispatching the next
    # image while the previous one's bytes stream back.  One worker keeps
    # pulls ordered; `depth` still bounds in-flight device buffers.
    # Invariant: every deque entry except possibly the newest is a worker
    # future resolving to bytes; the newest may be a raw (unadvanced) state.
    with ThreadPoolExecutor(max_workers=1) as puller:
        def resolve(item) -> bytes:
            bytes_or_state = item.result() if hasattr(item, "result") else item
            if isinstance(bytes_or_state, bytes):
                return bytes_or_state
            return _finish_compress(bytes_or_state, config)

        for img in images:
            if len(states) >= depth:
                out.append(resolve(states.popleft()))
            state = _start_compress(img, config, dt, pal)
            if states:
                # Advance the previous image (stats pull + phase-2 dispatch
                # for the sized path) AFTER dispatching this one's upload, so
                # the 20-byte sync overlaps the new transfer + transform;
                # then hand its blocking byte pull to the worker.
                prev = states.pop()
                states.append(puller.submit(
                    _finish_compress, _advance_compress(prev, config), config))
            states.append(state)
        while states:
            out.append(resolve(states.popleft()))
    return out


def decompress_to_ycbcr(bytestream: bytes, dtype=None) -> np.ndarray:
    """Container bytes -> (H, W, 3) uint8 YCbCr image.

    Device-side bit parsing is the default on TPU: the host does only the
    O(bytes) boundary scan (C++, or the pure-Python scanner when no
    compiler is present) and uploads the compressed stream itself — h2d
    shrinks from the coefficient levels to the compressed bytes.
    JPEG_TPU_DEVICE_DECODE=0 falls back to host entropy decode.
    """
    return np.asarray(_resolve_planes(
        _start_decompress(bytestream, dtype))).transpose(1, 2, 0)


def _start_decompress(bytestream: bytes, dtype):
    """Dispatch the device half of a decode without blocking (container
    parse + boundary scan stay host-side; bit parse + IDCT dispatch async).

    May return a zero-arg CALLABLE instead of a device array (the foreign
    host-free path defers its ok-check so the dispatch never syncs here);
    callers resolve it at pull time (:func:`_resolve_planes`)."""
    config, data = container.read_data(bytestream)
    dt, pal = _dt_and_pallas(config, dtype)
    from .utils.device import device_entropy_default, pow2_cap
    total = len(data.y) + len(data.cb) + len(data.cr)
    from .entropy import device_codec as DC
    # Gate on the codec's own tunable bit-position ceiling (DC._CAP_BITS,
    # tests lower it) so admission and the decode_stream check never skew.
    if (device_entropy_default(decode=True)
            and pow2_cap(total) * 8 < DC._CAP_BITS):
        nb, L = config.num_blocks, config.dct_size ** 2
        streams = [data.y, data.cb, data.cr]
        from .entropy.device_scan import scan_mode
        if scan_mode(total) == "device" and nb > 0:
            # Policy-selected host-free path: scan + parse + IDCT in ONE
            # dispatch (_decode3_foreign_fn), returned as a deferred
            # resolver so the in-program ok flag is only synced at pull
            # time — the main thread stays free to dispatch the next
            # image (decompress_many's overlap).  A rung-ladder rejection
            # resolves through the host-scan path, whose scanner raises
            # the canonical error for malformed streams.
            return _foreign_decode_lazy(config, streams, dt, pal)
        return _host_scan_decompress(config, streams, dt, pal)
    nb, L = config.num_blocks, config.dct_size ** 2
    with ThreadPoolExecutor(max_workers=3) as pool:
        levels = list(pool.map(
            lambda s: entropy.decode_levels(s, nb, L),
            (data.y, data.cb, data.cr)))
    fn = _decode3_fn(_band.config_key(config), dt.name, pal)
    return fn(np.stack(levels).astype(np.int16))


def _resolve_planes(res):
    """Resolve a :func:`_start_decompress` result: deferred foreign-path
    resolvers are called (syncing their ok flag, escalating rungs or
    falling back to the host scan); device arrays pass through."""
    return res() if callable(res) else res


def _host_scan_decompress(config: Configuration, streams, dt, pal):
    """Default device-entropy decode: host boundary scan + device bit
    parse/IDCT (one dispatch); returns the un-pulled device planes."""
    from .entropy import device_codec as DC
    from .utils.device import pow2_cap
    nb, L = config.num_blocks, config.dct_size ** 2
    buf = b"".join(streams)
    pad = pow2_cap(len(buf))
    arr = np.zeros(pad, np.uint8)
    arr[:len(buf)] = np.frombuffer(buf, np.uint8)
    # Kick the stream upload off FIRST (device_put is async), then run
    # the serial O(bytes) boundary scans while the bytes are in flight —
    # one band per thread (the C++ scanner releases the GIL), so the
    # host-side prelude and the h2d transfer overlap instead of stacking.
    # On the Pallas path the upload is little-endian WORDS (a free view
    # here) so the device never pays the u8 -> u32 bitcast relayout.
    arr_dev = jax.device_put(DC.host_stream_arg(arr))
    with ThreadPoolExecutor(max_workers=3) as pool:
        scans = list(pool.map(
            lambda s: entropy.scan_offsets(s, nb, L), streams))
    starts, off, max_bb = [], 0, 0
    for s, sc in zip(streams, scans):
        starts.append(sc + off)
        off += len(s)
        max_bb = max(max_bb, DC.max_block_bytes_of(sc, len(s)))
    all_starts = np.concatenate(starts)
    # Bucketed longest-block width sizes the decode word-row gather;
    # serial decompress_to_ycbcr shares this code (and executable).
    fn = _decode3_stream_fn(_band.config_key(config), dt.name, pal, pad,
                            DC.bucket_block_bytes(L, max_bb),
                            DC.sort_pays_off(all_starts, len(buf)))
    return fn(arr_dev, all_starts, np.int32(len(buf)))


def decompress_to_device(bytestream: bytes, dtype=None):
    """Container bytes -> (3, H, W) uint8 planes as a DEVICE array,
    NOT pulled to the host.

    The device-resident consumer form: on slow host links the plane pull
    dominates host->host decode (benchmarks/probes/probe_pipeline.py —
    a 12 MB pull at the dev tunnel's 15-30 MB/s costs 0.4-0.8 s while
    device decode is ~2 ms), so pipelines whose next stage runs on the
    accelerator anyway (augmentation, ML preprocessing, filters) should
    chain from this array instead of round-tripping through numpy.
    ``np.asarray(result)`` recovers :func:`decompress_to_ycbcr`'s planes
    (transpose to (H, W, 3) for the image convention)."""
    return _resolve_planes(_start_decompress(bytestream, dtype))


def decompress_many(blobs, dtype=None, depth: int = 2) -> list:
    """Pipelined decode of an iterable of container blobs: image i's plane
    pull overlaps image i+1's host scan + device decode.  Results are
    identical to per-image :func:`decompress_to_ycbcr`."""
    from collections import deque
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    pending: deque = deque()
    out = []

    def pull(planes):
        return np.asarray(_resolve_planes(planes)).transpose(1, 2, 0)

    # Plane pulls block on a 3*H*W d2h transfer; a single worker keeps them
    # ordered while the main thread runs the next blob's host boundary scan
    # and device dispatch under the previous blob's download.
    with ThreadPoolExecutor(max_workers=1) as puller:
        for blob in blobs:
            if len(pending) >= depth:
                out.append(pending.popleft().result())
            pending.append(puller.submit(pull, _start_decompress(blob, dtype)))
        while pending:
            out.append(pending.popleft().result())
    return out


class Jpeg:
    """Image-level codec (reference pipeline/__init__.py:98-124)."""

    def __init__(self, config: Configuration, dtype=None):
        self.config = config
        self.dtype = dtype

    def compress(self, image) -> bytes:
        """Compress a PIL image (converted to YCbCr) or (H, W, 3) array."""
        arr = _to_ycbcr_array(image)
        return compress_ycbcr(arr, self.config, dtype=self.dtype)

    @staticmethod
    def decompress(bytestream: bytes, dtype=None):
        """Decompress container bytes to a PIL YCbCr image (or an array if
        PIL is unavailable)."""
        arr = decompress_to_ycbcr(bytestream, dtype=dtype)
        try:
            from PIL import Image
        except ImportError:
            return arr
        return Image.fromarray(arr, mode="YCbCr")


def _to_ycbcr_array(image) -> np.ndarray:
    if isinstance(image, np.ndarray):
        return image
    if image.mode != "YCbCr":
        image = image.convert("YCbCr")
    return np.asarray(image)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio between two images (dB)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))
