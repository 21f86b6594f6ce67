"""Device-side entropy encoder vs the host codec: bit-identical streams."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jpeg_tpu.entropy import device_codec as DC
from jpeg_tpu.entropy import numpy_codec as NC

RNG = np.random.default_rng(11)


def _device_bytes(levels):
    stream, blk_bytes = jax.jit(DC.encode_stream)(jnp.asarray(levels))
    total = int(np.asarray(blk_bytes).sum())
    return np.asarray(stream)[:total].tobytes(), np.asarray(blk_bytes)


@pytest.mark.parametrize("L", [16, 64, 576])
def test_random_sparse_matches_host(L):
    for density in (0.0, 0.05, 0.3, 1.0):
        levels = np.zeros((37, L), dtype=np.int32)
        mask = RNG.random(levels.shape) < density
        levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        got, blk_bytes = _device_bytes(levels)
        want = NC.encode_levels(levels)
        assert got == want, f"L={L} density={density}"
        # per-block byte counts consistent with one-block encodes
        for i in [0, 17, 36]:
            assert blk_bytes[i] == len(NC.encode_levels(levels[i:i + 1]))


def test_edge_patterns():
    L = 64
    rows = np.zeros((6, L), dtype=np.int32)
    rows[1, 0] = -5
    rows[2, L - 1] = 1                 # 63 zeros -> 4 chains + code
    rows[3, 0] = 16383                 # max amplitude, size 15
    rows[4, 15] = 7                    # run == 15 -> chain + (0, size, amp)
    rows[5, :] = 1                     # fully dense block
    got, _ = _device_bytes(rows)
    assert got == NC.encode_levels(rows)


def test_single_block_and_empty():
    got, _ = _device_bytes(np.zeros((1, 64), np.int32))
    assert got == NC.encode_levels(np.zeros((1, 64), np.int32)) == b"\x00"


def test_bands_split():
    levels = np.zeros((3 * 9, 64), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.2
    levels[mask] = RNG.integers(-300, 300, int(mask.sum()))
    stream, band_bytes, mx = jax.jit(
        DC.encode_bands_stream, static_argnums=1)(jnp.asarray(levels), 3)
    band_bytes = np.asarray(band_bytes)
    buf = np.asarray(stream)[:band_bytes.sum()].tobytes()
    off = 0
    for b in range(3):
        part = buf[off:off + band_bytes[b]]
        off += band_bytes[b]
        assert part == NC.encode_levels(levels[9 * b:9 * (b + 1)])
    assert int(mx) == int(np.abs(levels).max())


def _device_decode(stream_bytes, num_blocks, L):
    from jpeg_tpu.entropy import native_codec
    if not native_codec.available():
        pytest.skip("native codec unavailable")
    starts = native_codec.scan_offsets(stream_bytes, num_blocks, L)
    buf = np.frombuffer(stream_bytes, np.uint8)
    fn = jax.jit(DC.decode_stream, static_argnums=2)
    return np.asarray(fn(jnp.asarray(buf), jnp.asarray(starts), L))


@pytest.mark.parametrize("L", [16, 64, 576])
def test_device_decode_matches_levels(L):
    for density in (0.0, 0.05, 0.3, 1.0):
        levels = np.zeros((23, L), dtype=np.int32)
        mask = RNG.random(levels.shape) < density
        levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        stream = NC.encode_levels(levels)
        got = _device_decode(stream, 23, L)
        np.testing.assert_array_equal(got, levels)


def test_device_decode_edge_patterns():
    L = 64
    rows = np.zeros((5, L), dtype=np.int32)
    rows[1, 0] = -5
    rows[2, L - 1] = 1
    rows[3, 0] = 16383
    rows[4, 15] = 7
    stream = NC.encode_levels(rows)
    np.testing.assert_array_equal(_device_decode(stream, 5, L), rows)


def test_scan_offsets_validates():
    from jpeg_tpu.config import BadStreamError
    from jpeg_tpu.entropy import native_codec
    if not native_codec.available():
        pytest.skip("native codec unavailable")
    levels = np.zeros((3, 64), np.int32)
    levels[0, 0] = 9
    stream = NC.encode_levels(levels)
    starts = native_codec.scan_offsets(stream, 3, 64)
    assert starts[0] == 0 and starts[1] == 3 and starts[2] == 4
    with pytest.raises(BadStreamError):
        native_codec.scan_offsets(stream[:-1], 3, 64)   # truncated
    with pytest.raises(BadStreamError):
        native_codec.scan_offsets(stream + b"\x00", 3, 64)  # trailing


def test_roundtrip_through_host_decoder():
    levels = np.zeros((25, 64), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.15
    levels[mask] = RNG.integers(-2000, 2000, int(mask.sum()))
    got, _ = _device_bytes(levels)
    back = NC.decode_levels(got, 25, 64)
    np.testing.assert_array_equal(back, levels)


def test_encode_stream_chunks_matches_one_shot(monkeypatch):
    L = 64
    levels = np.zeros((50, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.25
    levels[mask] = RNG.integers(-900, 900, int(mask.sum()))
    want = NC.encode_levels(levels)
    # default cap: single chunk, same bytes  (eager: jit would cache the
    # first trace across the cap monkeypatch below — production callers key
    # their fn caches on chunk_blocks instead)
    bufs, bb = DC.encode_stream_chunks(jnp.asarray(levels))
    assert bufs.shape[0] == 1
    assert DC.assemble_chunks(bufs, bb, DC.max_chunk_blocks(L)) == want
    # shrink the int32 ceiling so 50 blocks must split into 8 chunks
    monkeypatch.setattr(DC, "_CAP_BITS",
                        (7 * DC.worst_case_block_bytes(L) + 1) * 8)
    m = DC.max_chunk_blocks(L)
    assert m == 7
    bufs, bb = DC.encode_stream_chunks(jnp.asarray(levels))
    assert bufs.shape[0] == -(-50 // m)
    assert DC.assemble_chunks(bufs, bb, m) == want
    # single-shot encode_stream still refuses past the ceiling
    with pytest.raises(ValueError):
        DC.encode_stream(jnp.asarray(levels))


def test_compress_ycbcr_chunked_device_path(monkeypatch):
    """A batch past the (shrunk) int32 ceiling stays on the device-entropy
    path and produces byte-identical containers (VERDICT r1 item 7)."""
    from jpeg_tpu import Configuration, QuantizationMethod, api
    cfg = Configuration(width=64, height=48, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    img = RNG.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    want = api.compress_ycbcr(img, cfg)            # host-entropy reference
    monkeypatch.setattr(api, "_use_device_entropy", lambda: True)
    monkeypatch.setattr(DC, "_CAP_BITS",
                        (5 * DC.worst_case_block_bytes(64) + 1) * 8)
    assert DC.max_chunk_blocks(64) == 5            # 36 blocks -> 8 chunks
    assert api.compress_ycbcr(img, cfg) == want


@pytest.mark.parametrize("L", [16, 64])
def test_pallas_decode_kernel_matches_xla(L, monkeypatch):
    """Mosaic bitstream-decode kernel (interpret mode) == XLA fallback."""
    for density in (0.0, 0.08, 0.5):
        levels = np.zeros((37, L), dtype=np.int32)
        mask = RNG.random(levels.shape) < density
        levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        stream = NC.encode_levels(levels)
        starts = NC.scan_offsets(stream, 37, L)
        buf = jnp.asarray(np.frombuffer(stream, np.uint8))
        st = jnp.asarray(starts)
        want = np.asarray(DC.decode_stream(buf, st, L))     # XLA path (CPU)
        monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
        got = np.asarray(DC.decode_stream(buf, st, L))      # kernel path
        monkeypatch.delenv("JPEG_TPU_PALLAS")
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got, levels)


def test_pallas_decode_kernel_edge_sizes(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    from jpeg_tpu.ops.pallas_kernels import DEC_TILE
    L = 64
    for n in (1, DEC_TILE, DEC_TILE + 3):
        levels = np.zeros((n, L), dtype=np.int32)
        levels[:, 0] = np.arange(n) % 1000 - 500
        levels[:, L - 1] = 3
        stream = NC.encode_levels(levels)
        starts = NC.scan_offsets(stream, n, L)
        got = np.asarray(DC.decode_stream(
            jnp.asarray(np.frombuffer(stream, np.uint8)),
            jnp.asarray(starts), L))
        np.testing.assert_array_equal(got, levels)


def test_decode_geometry_buckets():
    # worst case for L=64 is 185 bytes: need (185+2)//4 = 46 -> G bucket 48
    assert DC.dec_group(64, 0) == 48 and DC.dec_weff(64, 0) == 48
    assert DC.words_per_block(64, 0) == 96          # overlap row = 2G
    assert DC.dec_group(64, 300) == 48              # > wc clamps to full
    assert DC.dec_group(64, 13) == 16 and DC.dec_weff(64, 13) == 6
    assert DC.dec_group(64, 43) == 16 and DC.dec_weff(64, 43) == 12
    assert DC.dec_group(64, 66) == 24
    assert DC.dec_group(64, 120) == 32
    for mb in (1, 5, 20, 60, 120, 185):
        G = DC.dec_group(64, mb)
        # a block starting anywhere in its group fits wholly in the 2G row
        assert (mb + 2) // 4 <= G
        # the trimmed kernel width still covers the block's bytes
        assert DC.dec_weff(64, mb) * 4 >= mb
        # bucket fixed point: same compiled geometry, never below mb
        b = DC.bucket_block_bytes(64, mb)
        assert b >= mb
        assert (DC.dec_group(64, b), DC.dec_weff(64, b)) == \
            (G, DC.dec_weff(64, mb))


def test_pallas_decode_dynamic_width(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    L = 64
    levels = np.zeros((37, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.2
    levels[mask] = RNG.integers(-900, 900, int(mask.sum()))
    stream = NC.encode_levels(levels)
    starts = NC.scan_offsets(stream, 37, L)
    buf = jnp.asarray(np.frombuffer(stream, np.uint8))
    st = jnp.asarray(starts)
    mbb = DC.max_block_bytes_of(starts, len(stream))
    for bb in (0, mbb, DC.bucket_block_bytes(L, mbb)):
        got = np.asarray(DC.decode_stream(buf, st, L, bb))
        np.testing.assert_array_equal(got, levels)


def test_pallas_decode_sorted_tiles(monkeypatch):
    """The length-sorted tile path (n > DEC_TILE) must return levels in
    original block order; shrink the tile so 64 blocks span many tiles."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "DEC_TILE", 8)
    L = 64
    levels = np.zeros((64, L), dtype=np.int32)
    # widely varying block lengths to force a nontrivial permutation
    for i in range(64):
        k = RNG.integers(0, L)
        levels[i, :k] = RNG.integers(-50, 50, k)
    stream = NC.encode_levels(levels)
    starts = NC.scan_offsets(stream, 64, L)
    buf = jnp.asarray(np.frombuffer(stream, np.uint8))
    got = np.asarray(DC.decode_stream(buf, jnp.asarray(starts), L))
    np.testing.assert_array_equal(got, levels)
    # The unsorted layout (hosts choose it for homogeneous bands via
    # sort_pays_off) must be bit-identical.
    got_u = np.asarray(DC.decode_stream(buf, jnp.asarray(starts), L,
                                        sort=False))
    np.testing.assert_array_equal(got_u, levels)


def test_sort_pays_off_decision():
    """Homogeneous lengths -> no sort; one long block per natural tile with
    tiny neighbours -> sort (per-tile maxima collapse under sorting)."""
    tile = 64
    n = 16 * tile
    homog = np.full(n, 20, np.int64)
    starts = np.cumsum(homog) - homog
    assert not DC.sort_pays_off(starts, int(homog.sum()), tile)
    hetero = np.full(n, 2, np.int64)
    hetero[::tile] = 180                       # every natural tile pays 180
    starts = np.cumsum(hetero) - hetero
    assert DC.sort_pays_off(starts, int(hetero.sum()), tile)
    # Fewer blocks than one tile: the tile max is the global max either way.
    assert not DC.sort_pays_off(starts[:tile // 2], int(hetero[:tile // 2]
                                                        .sum()), tile)


@pytest.mark.parametrize("L", [16, 64])
def test_pallas_encode_kernel_matches_host(L, monkeypatch):
    """Mosaic bitstream-ENCODE kernel + grouped-gather compaction
    (interpret mode) == host codec bytes, remainder zero."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)       # keep interpret fast
    densities = ((0.0, 0.08, 0.5, 1.0)
                 if os.environ.get("JPEG_TPU_SLOW_TESTS") else (0.08, 1.0))
    for density in densities:
        levels = np.zeros((37, L), dtype=np.int32)
        mask = RNG.random(levels.shape) < density
        levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        buf, blk_bytes = DC.encode_stream(jnp.asarray(levels))
        total = int(np.asarray(blk_bytes).sum())
        buf = np.asarray(buf)
        assert buf[:total].tobytes() == NC.encode_levels(levels), (
            f"L={L} density={density}")
        assert not buf[total:].any()


def _encode_merge_unit_edge(ns):
    from jpeg_tpu.ops import pallas_kernels as PK
    L = 64
    u = 1 << DC.MERGE_DEPTH
    for n in ns:
        levels = np.zeros((n, L), dtype=np.int32)
        levels[0::2, :] = 16383                   # worst-case length blocks
        levels[1::2, 0] = -1                      # next to near-empty ones
        buf, blk_bytes = DC.encode_stream(jnp.asarray(levels))
        total = int(np.asarray(blk_bytes).sum())
        buf = np.asarray(buf)
        assert buf[:total].tobytes() == NC.encode_levels(levels), f"n={n}"
        assert not buf[total:].any()


def test_pallas_encode_merge_unit_edge(monkeypatch):
    """A unit-straddle boundary in the default run, at the depth FLOOR
    (compact_rows scales MERGE_DEPTH down for small batches, so depth 6 is
    a real production configuration): n = 65 puts one block past the first
    64-block unit with worst-length blocks next to near-empty ones.  The
    full depth-9 straddle sweep is gated — each n is a separate ~25 s
    interpret trace over 8x the blocks."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    _encode_merge_unit_edge((65,))           # floor: m=6 (u=64), G=16


@pytest.mark.slow
def test_pallas_encode_merge_unit_edges(monkeypatch):
    """Block counts straddling the 2**MERGE_DEPTH merge-unit size, with
    max-length blocks adjacent to empty ones so compaction's output groups
    span unit boundaries."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    u = 1 << DC.MERGE_DEPTH
    _encode_merge_unit_edge((1, u - 1, u, u + 1, 2 * u + 2))


def test_pallas_encode_tile_boundary(monkeypatch):
    """Grid > 1: blocks spanning several ENC_TILE kernel tiles."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 8)
    L = 64
    levels = np.zeros((9, L), dtype=np.int32)
    for i in range(9):
        k = int(RNG.integers(0, L))
        levels[i, :k] = RNG.integers(-50, 50, k)
    buf, blk_bytes = DC.encode_stream(jnp.asarray(levels))
    total = int(np.asarray(blk_bytes).sum())
    assert np.asarray(buf)[:total].tobytes() == NC.encode_levels(levels)


@pytest.mark.slow
def test_pallas_encode_medium_L_tables(monkeypatch):
    """dct_size 12 -> L = 144 through the tables kernel (multi-word
    groups past the one-word fast path) in the default run; the L=576
    sweep is gated."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setenv("JPEG_TPU_ENC_TABLES", "1")
    monkeypatch.setattr(PK, "ENC_TILE", 8)
    L = 144
    levels = np.zeros((3, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.3
    levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
    buf, blk_bytes = DC.encode_stream(jnp.asarray(levels))
    total = int(np.asarray(blk_bytes).sum())
    buf = np.asarray(buf)
    assert buf[:total].tobytes() == NC.encode_levels(levels)
    assert not buf[total:].any()


@pytest.mark.slow
def test_pallas_encode_large_L(monkeypatch):
    """dct_size 24 -> L = 576 vectors (wide W, multi-word groups).

    Forces the tables kernel: interpret-mode L > 75 defaults to the
    scatter formulation (the lv kernel is impractically slow to trace
    interpreted at this L, and the tables path cannot carry > 4 chain
    bytes — this content has no such runs)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setenv("JPEG_TPU_ENC_TABLES", "1")
    monkeypatch.setattr(PK, "ENC_TILE", 8)
    L = 576
    levels = np.zeros((5, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.3
    levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
    buf, blk_bytes = DC.encode_stream(jnp.asarray(levels))
    total = int(np.asarray(blk_bytes).sum())
    buf = np.asarray(buf)
    assert buf[:total].tobytes() == NC.encode_levels(levels)
    assert not buf[total:].any()


@pytest.mark.parametrize("pallas", [False, True])
def test_words_interchange_roundtrip(pallas, monkeypatch):
    """emit="words" encode -> decode_stream directly on the BE words: the
    zero-relayout device-resident interchange must be bit-equivalent to the
    u8 form on both the Pallas and XLA paths."""
    if pallas:
        monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    else:
        monkeypatch.setenv("JPEG_TPU_NO_PALLAS", "1")
    L = 64
    levels = np.zeros((23, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.2
    levels[mask] = RNG.integers(-2000, 2000, int(mask.sum()))

    words, bb = jax.jit(lambda lv: DC.encode_stream(lv, emit="words"))(
        jnp.asarray(levels))
    assert words.dtype == jnp.uint32
    bb_np = np.asarray(bb)
    total = int(bb_np.sum())
    # the words' byte view equals the u8 form / the host codec
    be = np.asarray(words).astype(">u4").tobytes()[:total]
    assert be == NC.encode_levels(levels)

    starts = np.concatenate([[0], np.cumsum(bb_np)[:-1]]).astype(np.int32)
    got = np.asarray(jax.jit(
        lambda w, s: DC.decode_stream(w, s, L, total_len=jnp.int32(total)))(
            words, jnp.asarray(starts)))
    assert np.array_equal(got, levels)


def test_words_interchange_sized(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    L = 64
    # Dense enough that total stream BYTES exceed the buffer's WORD count —
    # the poison check must compare in bytes, not buffer elements.
    levels = np.zeros((16, L), dtype=np.int32)
    mask = RNG.random(levels.shape) < 0.6
    levels[mask] = RNG.integers(-16000, 16000, int(mask.sum()))
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(levels)))
    assert bb.sum() > 16 * DC.worst_case_block_bytes(L) // 4
    W = DC.encode_words_bucket(L, int(bb.max()))
    cap = DC.encode_cap_bucket(int(bb.sum()),
                               levels.shape[0] * DC.worst_case_block_bytes(L))
    words, bb2, bad = jax.jit(
        lambda lv: DC.encode_stream_sized(lv, W, cap, emit="words"))(
            jnp.asarray(levels))
    DC.check_sized_ok(bad)
    total = int(np.asarray(bb2).sum())
    assert np.asarray(words).astype(">u4").tobytes()[:total] == \
        NC.encode_levels(levels)
