"""Entropy codec tests: golden bitstreams, chains, errors, fuzz roundtrip.

Golden expectations mirror the reference behavior (tests/RLE_tests.py of the
reference repo asserts the same patterns)."""
import numpy as np
import pytest

from jpeg_tpu.config import BadRleCodeError, BadStreamError
from jpeg_tpu.entropy import numpy_codec as C
from jpeg_tpu.entropy import tuples as TU


def bits_of(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


def test_golden_single_code_bitstream():
    # one block: 4 zeros then +2  -> (4, 3, 2) EOB
    levels = np.array([[0, 0, 0, 0, 2, 0]])
    data = C.encode_levels(levels)
    assert bits_of(data) == "0100" + "0011" + "110" + "0" * 13


def test_golden_chain_bitstream():
    # 15 zeros then nothing else in a 16-long block: run 15 -> chain + (0,s,a)
    levels = np.zeros((1, 16), dtype=np.int64)
    levels[0, 15] = 1
    data = C.encode_levels(levels)
    # chain 11110000, then (0, 2, +1) = 0000 0010 1 1, EOB, pad to byte
    assert bits_of(data) == "11110000" + "0000" + "0010" + "11" + "0" * 8 + "0" * 6


def test_run_of_exactly_15_emits_chain_then_zero_run():
    levels = np.zeros((1, 32), dtype=np.int64)
    levels[0, 15] = 3
    t = TU.encode_levels_to_tuples(levels)
    assert t == [(15, 0, 0), (0, 3, 3), (0, 0)]
    assert C.decode_levels(C.encode_levels(levels), 1, 32).tolist() == \
        levels.tolist()


def test_long_zero_runs():
    row = np.array([0, 2] + [0] * 32 + [5] + [0] * 5)
    t = TU.encode_block(row)
    assert t == [(1, 3, 2), (15, 0, 0), (15, 0, 0), (2, 4, 5), (0, 0)]
    levels = row[None, :]
    assert C.decode_levels(C.encode_levels(levels), 1, row.size).tolist() == \
        levels.tolist()


def test_ordinary_block_codes():
    row = np.array([-15, 0, 0, 0, 3, 2, 0, 0, 0, 0, 120, 0, 0, 0, 0])
    t = TU.encode_block(row)
    assert t == [(0, 5, -15), (3, 3, 3), (0, 3, 2), (4, 8, 120), (0, 0)]


def test_multi_block_flat_tuples():
    a = np.array([[21, 3, 0, 0, 0, 0, 2, 0, 0],
                  [0, 0, 0, 15, 0, 0, 0, 0, 9],
                  [0] * 9])
    t = TU.encode_levels_to_tuples(a)
    assert t == [(0, 6, 21), (0, 3, 3), (4, 3, 2), (0, 0),
                 (3, 5, 15), (4, 5, 9), (0, 0),
                 (0, 0)]
    back = TU.decode_tuples_to_levels(t, 3, 9)
    assert back.tolist() == a.tolist()


def test_all_zero_blocks_are_one_byte_each():
    levels = np.zeros((5, 64), dtype=np.int64)
    data = C.encode_levels(levels)
    assert data == bytes(5)
    assert C.decode_levels(data, 5, 64).tolist() == levels.tolist()


def test_every_block_starts_byte_aligned():
    rng = np.random.default_rng(3)
    levels = rng.integers(-40, 40, size=(8, 64))
    data = C.encode_levels(levels)
    # encoding blocks separately and concatenating gives the same stream
    parts = b"".join(C.encode_levels(levels[i:i + 1]) for i in range(8))
    assert data == parts


def test_negative_amplitudes_roundtrip():
    levels = np.array([[0, -1, 0, -2, 0, 0, 0, 0, -3, 0, 0, 0, 0, 0, 0, -15]])
    data = C.encode_levels(levels)
    assert C.decode_levels(data, 1, 16).tolist() == levels.tolist()
    t = TU.bytes_to_tuples(TU.tuples_to_bytes(
        [(1, 2, -1), (0, 3, -2), (8, 3, -3), (8, 5, -15), (0, 0)]))
    assert t == [(1, 2, -1), (0, 3, -2), (8, 3, -3), (8, 5, -15), (0, 0)]


def test_amplitude_too_large_raises():
    levels = np.array([[16384] + [0] * 63])
    with pytest.raises(BadRleCodeError):
        C.encode_levels(levels)
    # 16383 is the largest representable amplitude (size 15)
    ok = np.array([[16383] + [0] * 63])
    assert C.decode_levels(C.encode_levels(ok), 1, 64).tolist() == ok.tolist()


@pytest.mark.parametrize("bad", [
    (15, 0, 1), (15, 0, -10), (16, 3, 3), (-1, 3, 3),
    (10, 16, 0), (4, -1, 0), (40, -18, 0), (12, 0, 0),
])
def test_invalid_tuple_codes_raise(bad):
    with pytest.raises(BadRleCodeError):
        TU.tuples_to_bytes([bad, (0, 0)])


def test_tuple_stream_roundtrips():
    for x in ([(14, 4, 7), (0, 0)],
              [(14, 4, 7), (0, 0), (0, 0), (15, 0, 0), (0, 2, 1), (0, 0)],
              [(15, 0, 0), (15, 0, 0), (0, 2, 1), (0, 0)]):
        assert TU.bytes_to_tuples(TU.tuples_to_bytes(x)) == x


def test_decoder_rejects_trailing_garbage():
    levels = np.array([[1, 0, 0, 0]])
    data = C.encode_levels(levels)
    with pytest.raises(BadStreamError):
        C.decode_levels(data + b"\x00", 1, 4)


def test_decoder_rejects_truncation():
    levels = np.array([[5, 3, 1, 0] * 4])
    data = C.encode_levels(levels)
    with pytest.raises(BadStreamError):
        C.decode_levels(data[:-1], 1, 16)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_roundtrip_against_tuple_path(seed):
    rng = np.random.default_rng(seed)
    n, L = 17, 64
    levels = np.zeros((n, L), dtype=np.int64)
    mask = rng.random((n, L)) < 0.15
    levels[mask] = rng.integers(-16383, 16384, size=int(mask.sum()))
    data = C.encode_levels(levels)
    # vectorized codec == tuple-by-tuple codec
    assert data == TU.tuples_to_bytes(TU.encode_levels_to_tuples(levels))
    dec = C.decode_levels(data, n, L)
    assert dec.tolist() == levels.tolist()
    assert TU.decode_tuples_to_levels(
        TU.bytes_to_tuples(data), n, L).tolist() == levels.tolist()


def test_sparse_and_dense_extremes():
    L = 64
    dense = np.full((3, L), -1, dtype=np.int64)
    assert C.decode_levels(C.encode_levels(dense), 3, L).tolist() == \
        dense.tolist()
    tail = np.zeros((2, L), dtype=np.int64)
    tail[:, L - 1] = 7
    assert C.decode_levels(C.encode_levels(tail), 2, L).tolist() == \
        tail.tolist()
