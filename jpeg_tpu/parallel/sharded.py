"""Sharded encode/decode: batch data-parallelism and row-band tiling.

The reference processes one band of one image at a time in pure Python
(reference: pipeline/__init__.py:102-110).  Here the whole coefficient path
(pad -> subsample -> DCT+zigzag matmul -> quantize) runs as ONE jitted
program over a :class:`jax.sharding.Mesh`:

* ``data`` axis: a batch of images/bands, embarrassingly parallel.
* ``band`` axis: image rows.  DCT blocks never couple across rows, so GSPMD
  needs at most an edge-halo exchange at pad seams; everything else is local.

Entropy coding stays host-side (variable-length bit packing) but is
*seam-parallel*: every block's bitstream is byte-aligned (reference:
rle_byte_stream.py:54-56), so per-row-band streams encoded independently
concatenate into exactly the single-stream bytes.  That concatenation is the
distributed "bitstream stitch": on a multi-host slice each host encodes its
local block rows and an all-gather of byte lengths fixes the offsets.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import container, entropy
from ..config import Configuration
from ..container import CompressedData
from ..ops import band as band_ops
from ..utils.device import pull_prefix
from . import mesh as mesh_lib
from . import stats

_BATCH_FNS: Dict[Tuple, object] = {}
_PLANE_FNS: Dict[Tuple, object] = {}


def _mesh_pallas(mesh, dt: np.dtype, transform: str) -> bool:
    """Pallas kernels when the mesh devices are TPUs and dtype is f32 —
    keeps sharded encodes bit-identical to the single-device fast path."""
    import os
    if os.environ.get("JPEG_TPU_NO_PALLAS"):
        return False
    return (dt == np.float32 and transform in ("DCT", "DFT")
            and mesh.devices.flat[0].platform == "tpu")


def _batch_encode_fn(key: Tuple, dtype_name: str, mesh, shape: Tuple,
                     use_pallas: bool = False, with_stats: bool = True):
    """Jitted (B, H, W) -> ((B, N, L) levels[, total payload bytes]).

    ``with_stats=False`` skips the size-geometry pass + cross-mesh
    all-reduce for callers that only need the levels."""
    cache_key = (key, dtype_name, mesh, shape, use_pallas, with_stats)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        encode_one = band_ops.make_encode_batch(key, dtype_name, use_pallas)

        def step(bands):
            levels = encode_one(bands)
            if not with_stats:
                return levels
            # Global reduction over all shards -> XLA all-reduce on the mesh.
            return levels, stats.total_bytes(levels)

        fn = jax.jit(step, in_shardings=mesh_lib.batch_sharding(mesh, shape))
        _BATCH_FNS[cache_key] = fn
    return fn


def _plane_encode_fn(key: Tuple, dtype_name: str, mesh, shape: Tuple,
                     use_pallas: bool = False):
    """Jitted (H, W) -> (N, L) levels with rows sharded over all devices.

    The output is explicitly sharded over block rows (same flat mesh) so
    downstream per-shard entropy sees contiguous block ranges per device."""
    cache_key = (key, dtype_name, mesh, shape, use_pallas)
    fn = _PLANE_FNS.get(cache_key)
    if fn is None:
        h, w, bs, d, transform, qname, qparams = key
        cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                            transform=transform)
        encode_one = band_ops.make_encode(key, dtype_name, use_pallas)
        in_sh = mesh_lib.plane_sharding(mesh, shape)
        out_sh = mesh_lib.plane_sharding(
            mesh, (cfg.num_blocks, d * d))
        fn = jax.jit(encode_one, in_shardings=in_sh, out_shardings=out_sh)
        _PLANE_FNS[cache_key] = fn
    return fn


def encode_batch_levels(bands, config: Configuration, mesh,
                        dtype=None) -> Tuple[np.ndarray, int]:
    """Batch-of-bands coefficient path on the mesh.

    Args:
      bands: (B, H, W) integer array of same-size image bands.
    Returns:
      ((B, num_blocks, L) int32 levels, exact total payload bytes).
    """
    bands = jnp.asarray(bands)
    band_ops.check_band_shape(bands[0], config)
    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    fn = _batch_encode_fn(band_ops.config_key(config), dt.name, mesh,
                          tuple(bands.shape),
                          _mesh_pallas(mesh, dt, config.transform))
    levels, nbytes = fn(bands)
    return np.asarray(levels), int(nbytes)


def stitch_streams(parts: Sequence[bytes]) -> bytes:
    """Concatenate per-shard byte-aligned streams into the canonical stream."""
    return b"".join(parts)


def _encode_levels_parts(levels: np.ndarray, n_parts: int,
                         rows_per_part: int) -> bytes:
    """Entropy-encode (N, L) levels as row-band parts in parallel threads.

    ``levels`` rows are blocks in row-major block order; a part is a
    contiguous run of whole block-rows, so each part's stream starts
    byte-aligned and the concatenation is bit-identical to one-shot encode.
    """
    n_blocks = levels.shape[0]
    bounds = [min(i * rows_per_part, n_blocks) for i in range(n_parts + 1)]
    chunks = [levels[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
    chunks = [c for c in chunks if c.shape[0]]
    if len(chunks) <= 1:
        return entropy.encode_levels(levels)
    with ThreadPoolExecutor(max_workers=len(chunks)) as pool:
        parts = list(pool.map(entropy.encode_levels, chunks))
    return stitch_streams(parts)


def compress_plane(plane, config: Configuration, mesh, dtype=None) -> bytes:
    """Row-band-tiled single-plane compress; bytes == single-device bytes."""
    plane = jnp.asarray(plane)
    band_ops.check_band_shape(plane, config)
    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    fn = _plane_encode_fn(band_ops.config_key(config), dt.name, mesh,
                          tuple(plane.shape),
                          _mesh_pallas(mesh, dt, config.transform))
    levels = np.asarray(fn(plane))
    n_shards = mesh.devices.size
    rows_per_shard = -(-config.blocks_high // n_shards)
    return _encode_levels_parts(levels, n_shards,
                                rows_per_shard * config.blocks_wide)


def compress_plane_device_entropy(plane, config: Configuration, mesh,
                                  dtype=None) -> bytes:
    """Row-band compress with PER-SHARD on-device entropy encoding.

    The fully TPU-native distributed encode (SURVEY.md §2b): each device
    runs the coefficient path AND assembles the bitstream for its own block
    rows (entropy/device_codec.py) under ``shard_map``; the host only pulls
    each shard's used prefix and concatenates.  Byte-aligned blocks make the
    concatenation bit-identical to the serial stream.

    Block rows are padded to a multiple of the shard count with all-zero
    blocks; each padding block encodes to exactly one EOB byte at the tail
    of the last shard's stream and is dropped before stitching.
    """
    from functools import partial
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from ..entropy import device_codec as DC

    plane = jnp.asarray(plane)
    band_ops.check_band_shape(plane, config)
    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    fn = _plane_encode_fn(band_ops.config_key(config), dt.name, mesh,
                          tuple(plane.shape),
                          _mesh_pallas(mesh, dt, config.transform))
    levels = fn(plane)                                   # (N, L) device

    n_shards = mesh.devices.size
    flat = Mesh(mesh.devices.reshape(-1), (mesh_lib.BAND_AXIS,))
    L = config.dct_size ** 2
    n_blocks = config.num_blocks
    n_padded = -(-n_blocks // n_shards) * n_shards
    n_pad = n_padded - n_blocks
    if n_pad:
        levels = jnp.concatenate(
            [levels, jnp.zeros((n_pad, L), levels.dtype)], axis=0)

    cache_key = ("shard_entropy", flat, n_padded, L)
    fn_se = _PLANE_FNS.get(cache_key)
    if fn_se is None:
        @partial(shard_map, mesh=flat, in_specs=P(mesh_lib.BAND_AXIS, None),
                 out_specs=(P(mesh_lib.BAND_AXIS, None),
                            P(mesh_lib.BAND_AXIS), P()))
        def shard_encode(local_levels):
            buf, blk_bytes = DC.encode_stream(local_levels)
            mx = jax.lax.pmax(jnp.max(jnp.abs(local_levels)),
                              mesh_lib.BAND_AXIS)
            return buf[None, :], blk_bytes, mx
        fn_se = jax.jit(shard_encode)
        _PLANE_FNS[cache_key] = fn_se

    buf, blk_bytes, mx = fn_se(levels)                   # (S, worst), (Np,)
    if int(mx) > DC.MAX_AMP:
        from ..config import BadRleCodeError
        raise BadRleCodeError(
            f"amplitude {int(mx)} exceeds the representable {DC.MAX_AMP}")
    blk_bytes = np.asarray(blk_bytes)
    m = n_padded // n_shards
    # Real blocks are a prefix of each shard's contiguous range, so the
    # padding blocks' EOB bytes sit at the shard buffer's tail — drop by
    # summing only the real blocks' byte counts.
    used = [int(blk_bytes[s * m:min((s + 1) * m, n_blocks)].sum())
            for s in range(n_shards)]
    # ONE device->host transfer for all shards (row-band shards are
    # balanced, so pulling every row to the max used length overfetches
    # little), instead of a blocking pull per shard.
    from ..utils.device import pow2_cap
    cap = min(pow2_cap(max(used, default=1)), buf.shape[1])
    host = np.asarray(buf[:, :cap])
    return stitch_streams([host[s, :used[s]].tobytes()
                           for s in range(n_shards)])


def decompress_plane(data: bytes, config: Configuration, mesh,
                     dtype=None, device_entropy: Optional[bool] = None
                     ) -> np.ndarray:
    """Row-band-tiled decode of ONE band stream — the dual of
    :func:`compress_plane_device_entropy` (reference dual: the descending
    ``decompress_band`` pipeline, pipeline/__init__.py:79-88).

    The host performs only the serial O(bytes) boundary scan
    (entropy.scan_offsets, C++ or pure Python); bit parsing and the IDCT
    path run in one jitted program with the block rows sharded over the
    flattened mesh.  Bit-equal to ``api.decompress_band`` by construction
    (same decode kernel, same device codec).
    """
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.sharding import NamedSharding

    nb, L = config.num_blocks, config.dct_size ** 2
    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    pal = _mesh_pallas(mesh, dt, config.transform)
    key = band_ops.config_key(config)
    flat = Mesh(mesh.devices.reshape(-1), (mesh_lib.BAND_AXIS,))

    if device_entropy is None:
        from ..entropy import device_codec as DC
        from ..utils.device import device_entropy_default, pow2_cap
        device_entropy = (device_entropy_default(decode=True)
                          and pow2_cap(len(data)) * 8 < DC._CAP_BITS)
    if device_entropy:
        from ..entropy import device_codec as DC
        from ..utils.device import pow2_cap
        pad = pow2_cap(len(data))
        arr = np.zeros(pad, np.uint8)
        arr[:len(data)] = np.frombuffer(data, np.uint8)
        # Start the (replicated) stream upload before the serial boundary
        # scan: device_put is async, so the h2d transfer rides under the
        # O(bytes) host scan instead of serializing after it.
        arr_dev = jax.device_put(DC.host_stream_arg(arr),
                                 NamedSharding(flat, P()))
        starts = entropy.scan_offsets(data, nb, L)     # validates the stream
        bucket_bb = DC.bucket_block_bytes(
            L, DC.max_block_bytes_of(starts, len(data)))
        srt = DC.sort_pays_off(starts, len(data))
        cache_key = ("dec_plane_stream", key, dt.name, flat, pad, pal,
                     bucket_bb, srt)
        fn = _PLANE_FNS.get(cache_key)
        if fn is None:
            decode_one = band_ops.make_decode(key, dt.name, pal)
            lv_sh = NamedSharding(flat, mesh_lib.fit_spec(
                (nb, L), flat, P(mesh_lib.BAND_AXIS, None)))

            def step(stream, starts_arr, total):
                # Stream/starts replicate (compressed bytes are small);
                # the lockstep bit parse and IDCT shard over block rows.
                levels = DC.decode_stream(stream, starts_arr, L,
                                          bucket_bb, sort=srt,
                                          total_len=total)
                levels = jax.lax.with_sharding_constraint(levels, lv_sh)
                return decode_one(levels)

            fn = jax.jit(step, in_shardings=(NamedSharding(flat, P()),
                                             NamedSharding(flat, P()),
                                             NamedSharding(flat, P())))
            _PLANE_FNS[cache_key] = fn
        return np.asarray(fn(arr_dev, starts.astype(np.int32),
                             np.int32(len(data))))

    # Host entropy decode (C++/NumPy), then the sharded IDCT path.
    levels = entropy.decode_levels(bytes(data), nb, L)
    cache_key = ("dec_plane", key, dt.name, flat, pal)
    fn = _PLANE_FNS.get(cache_key)
    if fn is None:
        decode_one = band_ops.make_decode(key, dt.name, pal)
        fn = jax.jit(decode_one,
                     in_shardings=NamedSharding(flat, mesh_lib.fit_spec(
                         (nb, L), flat, P(mesh_lib.BAND_AXIS, None))),
                     out_shardings=NamedSharding(flat, mesh_lib.fit_spec(
                         (config.height, config.width), flat,
                         P(mesh_lib.BAND_AXIS, None))))
        _PLANE_FNS[cache_key] = fn
    return np.asarray(fn(jnp.asarray(levels)))


def _batch_stream_fn(key: Tuple, dtype_name: str, mesh, shape: Tuple,
                     use_pallas: bool = False):
    """Jitted (B, H, W) -> (stream bytes, per-band byte counts, max level)."""
    cache_key = ("stream", key, dtype_name, mesh, shape, use_pallas)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        from ..entropy import device_codec as DC
        encode_one = band_ops.make_encode_batch(key, dtype_name, use_pallas)

        def step(bands):
            levels = encode_one(bands)          # (B, N, L)
            flat = levels.reshape(-1, levels.shape[-1])
            return DC.encode_bands_stream(flat, bands.shape[0])

        fn = jax.jit(step, in_shardings=mesh_lib.batch_sharding(mesh, shape))
        _BATCH_FNS[cache_key] = fn
    return fn


def _batch_levels_stats_fn(key: Tuple, dtype_name: str, mesh, shape: Tuple,
                           use_pallas: bool = False):
    """Phase 1 of the content-sized batch encode: (B, H, W) bands ->
    (flat levels (B*N, L) int32, stats).

    stats = [band bytes (B,) ..., max block bytes, total bytes, max |level|,
    min constraining merge-unit bytes]
    — the only host transfer before phase 2; the levels stay device-
    resident with their sharding (same two-phase structure as the
    single-image path, api.py:_encode3_levels_stats_fn)."""
    cache_key = ("levels_stats", key, dtype_name, mesh, shape, use_pallas)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        from ..entropy import device_codec as DC
        encode_one = band_ops.make_encode_batch(key, dtype_name, use_pallas)

        def step(bands):
            levels = encode_one(bands)          # (B, N, L)
            flat = levels.reshape(-1, levels.shape[-1])
            bb = DC.block_bytes_of(flat)
            band_bytes = jnp.sum(bb.reshape(bands.shape[0], -1), axis=-1)
            tail = jnp.stack([jnp.max(bb), jnp.sum(bb),
                              jnp.max(jnp.abs(flat)),
                              DC.min_unit_bytes_of(bb)]).astype(jnp.int32)
            return flat, jnp.concatenate([band_bytes, tail])

        fn = jax.jit(step, in_shardings=mesh_lib.batch_sharding(mesh, shape))
        _BATCH_FNS[cache_key] = fn
    return fn


def _batch_entropy_sized_fn(W: int, cap: int, mesh, G: int = 0):
    """Phase 2: (B*N, L) sharded levels -> cap-byte stream buffer at the
    bucketed row width W and gather group G (mesh keys the cache alongside
    the buckets)."""
    cache_key = ("entropy_sized", W, cap, G, mesh)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        from ..entropy import device_codec as DC
        def step(flat):
            buf, _, bad = DC.encode_stream_sized(flat, W, cap, G)
            return buf, bad

        fn = jax.jit(step)
        _BATCH_FNS[cache_key] = fn
    return fn


def _batch_stream_chunked_fn(key: Tuple, dtype_name: str, mesh, shape: Tuple,
                             use_pallas: bool, chunk_blocks: int):
    """Jitted (B, H, W) -> (chunk bufs, per-block bytes, band bytes, max)
    for batches whose worst-case output exceeds int32 bit positions."""
    cache_key = ("stream_chunked", key, dtype_name, mesh, shape, use_pallas,
                 chunk_blocks)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        from ..entropy import device_codec as DC
        encode_one = band_ops.make_encode_batch(key, dtype_name, use_pallas)

        def step(bands):
            levels = encode_one(bands)          # (B, N, L)
            flat = levels.reshape(-1, levels.shape[-1])
            bufs, blk_bytes = DC.encode_stream_chunks(flat)
            band_bytes = jnp.sum(blk_bytes.reshape(bands.shape[0], -1),
                                 axis=-1)
            mx = jnp.max(jnp.abs(flat)).astype(jnp.int32)
            return bufs, blk_bytes, band_bytes, mx

        fn = jax.jit(step, in_shardings=mesh_lib.batch_sharding(mesh, shape))
        _BATCH_FNS[cache_key] = fn
    return fn


def _check_amp(mx: int) -> None:
    from ..config import BadRleCodeError
    from ..entropy import MAX_AMP
    if mx > MAX_AMP:
        raise BadRleCodeError(
            f"amplitude {mx} exceeds the representable {MAX_AMP}")


def compress_batch(images, config: Configuration, mesh,
                   dtype=None, device_entropy: Optional[bool] = None
                   ) -> List[bytes]:
    """(B, H, W, 3) uint8 YCbCr batch -> list of B container blobs.

    The coefficient path for all B*3 bands runs as one sharded program.
    Entropy: on device (default on the TPU backend) the whole batch's
    bitstream is assembled in the same program and only the compressed
    bytes come back; otherwise per-band host encodes run on a thread pool
    (the C++ codec releases the GIL during the ctypes call).
    """
    images = np.asarray(images)
    if images.ndim != 4 or images.shape[3] != 3:
        raise ValueError(f"expected (B, H, W, 3) batch, got {images.shape}")
    b = images.shape[0]
    bands = images.transpose(0, 3, 1, 2).reshape(
        b * 3, images.shape[1], images.shape[2])
    if device_entropy is None:
        from ..utils.device import device_entropy_default
        device_entropy = device_entropy_default()

    if device_entropy:
        from ..entropy import device_codec as DC
        dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
        pal = _mesh_pallas(mesh, dt, config.transform)
        L = config.dct_size ** 2
        n_total = b * 3 * config.num_blocks
        m = DC.max_chunk_blocks(L)
        if n_total <= m and DC.sized_entropy_default(L):
            # Content-sized two-phase encode: the host pulls only the stats
            # vector, buckets the entropy shapes and dispatches phase 2 on
            # the device-resident levels.
            fn = _batch_levels_stats_fn(band_ops.config_key(config), dt.name,
                                        mesh, tuple(bands.shape), pal)
            flat, stats = fn(jnp.asarray(bands))
            st = np.asarray(stats)
            band_bytes = st[:3 * b]
            max_bb, total, mx, min_unit = (int(x) for x in st[3 * b:])
            _check_amp(mx)
            Wb = DC.encode_words_bucket(L, max_bb)
            cap = DC.encode_cap_bucket(
                total, n_total * DC.worst_case_block_bytes(L))
            Gb = DC.gather_group_bucket(min_unit, n_total, Wb)
            buf_dev, bad = _batch_entropy_sized_fn(Wb, cap, mesh, Gb)(flat)
            DC.check_sized_ok(bad)
            buf = pull_prefix(buf_dev, total)
        elif n_total <= m:
            fn = _batch_stream_fn(band_ops.config_key(config), dt.name, mesh,
                                  tuple(bands.shape), pal)
            stream, band_bytes, mx = fn(jnp.asarray(bands))
            _check_amp(int(mx))
            buf = pull_prefix(stream, int(np.asarray(band_bytes).sum()))
        else:
            # Past the int32 bit-position ceiling the encoder self-chunks;
            # byte-aligned blocks make the chunk concatenation exact.
            fn = _batch_stream_chunked_fn(band_ops.config_key(config),
                                          dt.name, mesh, tuple(bands.shape),
                                          pal, m)
            bufs, blk_bytes, band_bytes, mx = fn(jnp.asarray(bands))
            _check_amp(int(mx))
            buf = DC.assemble_chunks(bufs, blk_bytes, m)
        bb = np.asarray(band_bytes).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(bb)])
        streams = [buf[offs[i]:offs[i + 1]] for i in range(3 * b)]
    else:
        dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
        fn = _batch_encode_fn(band_ops.config_key(config), dt.name, mesh,
                              tuple(bands.shape),
                              _mesh_pallas(mesh, dt, config.transform),
                              with_stats=False)
        levels = np.asarray(fn(jnp.asarray(bands)))
        with ThreadPoolExecutor(max_workers=min(16, max(1, b * 3))) as pool:
            streams = list(pool.map(entropy.encode_levels, list(levels)))
    out = []
    for i in range(b):
        data = CompressedData(streams[3 * i], streams[3 * i + 1],
                              streams[3 * i + 2])
        out.append(container.generate_data(config, data))
    return out


def decompress_batch(blobs: Sequence[bytes], mesh, dtype=None,
                     device_entropy: Optional[bool] = None) -> np.ndarray:
    """List of container blobs (same config) -> (B, H, W, 3) uint8 batch.

    With device entropy (default on the TPU backend), the host performs only
    the per-band boundary scans; the concatenated streams upload once and
    all bit parsing + IDCT runs in a single jitted program.
    """
    configs_and_data = [container.read_data(b) for b in blobs]
    config = configs_and_data[0][0]
    L = config.dct_size ** 2
    nb = config.num_blocks
    flat_streams = []
    for cfg, data in configs_and_data:
        if band_ops.config_key(cfg) != band_ops.config_key(config):
            raise ValueError("decompress_batch requires a homogeneous batch")
        flat_streams.extend([data.y, data.cb, data.cr])

    if device_entropy is None:
        from ..utils.device import device_entropy_default, pow2_cap
        total = sum(len(s) for s in flat_streams)
        from ..entropy import device_codec as DC
        # Conservative: the sharded upload only needs each SLICE under the
        # codec ceiling (DC._CAP_BITS), but slice sizes aren't known until
        # after the boundary scan; total is always an upper bound.
        device_entropy = (device_entropy_default(decode=True)
                          and pow2_cap(total) * 8 < DC._CAP_BITS)
    if device_entropy:
        return _decompress_batch_device(flat_streams, config, mesh,
                                        len(blobs), dtype)

    with ThreadPoolExecutor(max_workers=min(16, len(flat_streams))) as pool:
        levels = list(pool.map(
            lambda s: entropy.decode_levels(s, nb, L), flat_streams))
    levels = np.stack(levels)  # (B*3, N, L)

    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    key = band_ops.config_key(config)
    pal = _mesh_pallas(mesh, dt, config.transform)
    cache_key = ("dec", key, dt.name, mesh, levels.shape, pal)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        decode_one = band_ops.make_decode(key, dt.name, pal)
        fn = jax.jit(jax.vmap(decode_one),
                     in_shardings=mesh_lib.levels_sharding(
                         mesh, levels.shape))
        _BATCH_FNS[cache_key] = fn
    planes = np.asarray(fn(jnp.asarray(levels)))  # (B*3, H, W)
    b = len(blobs)
    return planes.reshape(b, 3, config.height, config.width).transpose(
        0, 2, 3, 1).astype(np.uint8)


def _shard_stream_slices(flat_streams: Sequence[bytes],
                         scans: Sequence[np.ndarray],
                         ndev: int) -> Tuple[np.ndarray, np.ndarray]:
    """Split a batch of byte-aligned band streams into per-device slices.

    Every block's bitstream is byte-aligned (reference rle_byte_stream.py:
    54-56) and its start byte is host-known from the boundary scans, so the
    flat block range splits CONTIGUOUSLY across devices: device k gets
    blocks [k*Nd, (k+1)*Nd) and only the bytes those blocks occupy — the
    decode dual of the encode bitstream stitch.  Without this, the whole
    concatenated batch stream would replicate to every device (8x HBM for
    a multi-GB batch on a real slice).

    Returns ``(slices (ndev, sw) uint8, local_starts (ndev, Nd) int32,
    slice_lens (ndev, 1) int32)`` where ``sw`` is the pow2-bucketed longest
    slice and ``slice_lens`` each shard's TRUE byte count.  The flat block count
    pads to a multiple of ndev with dummy blocks pointing at a trailing
    zero byte (a 0x00 stream decodes as immediate EOB -> an all-zero
    block); callers drop the padded tail.  Slice padding bytes are zero.
    """
    from ..utils.device import pow2_cap

    # Global block start offsets (int64 on the host: only shard-LOCAL
    # offsets ever reach the device, so batches past int32 total bytes
    # stay decodable as long as each shard's slice fits).
    starts, off = [], 0
    for s, sc in zip(flat_streams, scans):
        starts.append(sc.astype(np.int64) + off)
        off += len(s)
    gstarts = np.concatenate(starts)
    total = off
    n = gstarts.shape[0]
    n_pad = -(-n // ndev) * ndev
    nd = n_pad // ndev
    # Block ends = next block's start; last real block ends at the stream
    # end; dummy blocks read the appended zero byte.
    ends = np.concatenate([gstarts[1:], [total]])
    if n_pad != n:
        gstarts = np.concatenate(
            [gstarts, np.full(n_pad - n, total, np.int64)])
        ends = np.concatenate([ends, np.full(n_pad - n, total + 1, np.int64)])
    buf = b"".join(flat_streams) + b"\x00"
    lo = gstarts[0::nd]                           # slice base per device
    hi = ends[nd - 1::nd]                         # slice end per device
    sw = pow2_cap(int((hi - lo).max()))
    slices = np.zeros((ndev, sw), np.uint8)
    view = np.frombuffer(buf, np.uint8)
    for k in range(ndev):
        slices[k, :hi[k] - lo[k]] = view[lo[k]:hi[k]]
    local = (gstarts.reshape(ndev, nd) - lo[:, None]).astype(np.int32)
    return slices, local, (hi - lo).astype(np.int32)[:, None]


def _decompress_batch_device(flat_streams: List[bytes],
                             config: Configuration, mesh, b: int,
                             dtype=None) -> np.ndarray:
    """Device bit-parse + decode for a homogeneous batch of band streams.

    The bit parse runs under ``shard_map`` over the flattened mesh with
    each device holding ONLY its contiguous slice of the batch stream
    (:func:`_shard_stream_slices`); the parsed levels then reshard to the
    (data, band) layout for the IDCT stage — levels are ~4x the pixel
    volume, far cheaper to move over ICI than replicating the stream.
    """
    from ..entropy import device_codec as DC

    nb, L = config.num_blocks, config.dct_size ** 2
    with ThreadPoolExecutor(max_workers=min(16, len(flat_streams))) as pool:
        scans = list(pool.map(
            lambda s: entropy.scan_offsets(s, nb, L), flat_streams))
    max_bb = max(DC.max_block_bytes_of(sc, len(s))
                 for s, sc in zip(flat_streams, scans))
    bucket_bb = DC.bucket_block_bytes(L, max_bb)
    srt = DC.sort_pays_off_from_lens(np.concatenate(
        [np.diff(sc, append=len(s)) for s, sc in zip(flat_streams, scans)]))
    ndev = int(mesh.devices.size)
    slices, local_starts, slice_lens = _shard_stream_slices(
        flat_streams, scans, ndev)
    slices = DC.host_stream_arg(slices.reshape(-1)).reshape(ndev, -1)
    n = b * 3 * nb

    dt = np.dtype(dtype if dtype is not None else band_ops.default_dtype())
    key = band_ops.config_key(config)
    pal = _mesh_pallas(mesh, dt, config.transform)
    cache_key = ("dec_stream", key, dt.name, mesh, slices.shape,
                 local_starts.shape, b, pal, bucket_bb, srt)
    fn = _BATCH_FNS.get(cache_key)
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        decode_one = band_ops.make_decode(key, dt.name, pal)
        # One device per row of `slices`: shard dim 0 over BOTH mesh axes
        # jointly (flat device order == mesh.devices.reshape(-1), the order
        # _shard_stream_slices assigned block ranges in).
        both = (mesh_lib.DATA_AXIS, mesh_lib.BAND_AXIS)
        lv_sh = NamedSharding(mesh, mesh_lib.fit_spec(
            (b, 3, nb, L), mesh,
            P(mesh_lib.DATA_AXIS, None, mesh_lib.BAND_AXIS, None)))
        in_sh = NamedSharding(mesh, P(both, None))

        def parse_local(sl, st, tl):
            return DC.decode_stream(sl[0], st[0], L, bucket_bb,
                                    sort=srt, total_len=tl[0, 0])[None]

        def step(sl, st, tl):
            lv = jax.shard_map(parse_local, mesh=mesh,
                               in_specs=(P(both, None), P(both, None),
                                         P(both, None)),
                               out_specs=P(both, None, None))(sl, st, tl)
            levels = jax.lax.with_sharding_constraint(
                lv.reshape(-1, L)[:n].reshape(b, 3, nb, L), lv_sh)
            planes = jax.vmap(jax.vmap(decode_one))(levels)
            return planes.astype(jnp.uint8)          # (B, 3, H, W)

        fn = jax.jit(step, in_shardings=(in_sh, in_sh, in_sh))
        _BATCH_FNS[cache_key] = fn
    planes = np.asarray(fn(slices, local_starts, slice_lens))
    return planes.transpose(0, 2, 3, 1)
