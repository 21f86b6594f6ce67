"""Pure-Python O(bytes) boundary scanner: parity with the C++ scanner,
error behavior, and the no-compiler device-decode dependency chain.

The scanner (entropy/numpy_codec.py:scan_offsets) is the serial prelude to
block-parallel decode (reference decodes serially per code the same way,
rle_byte_stream.py:74-88); it replaced the old all-offsets speculative scan
that did O(bytes * L) work.
"""
import numpy as np
import pytest

import jpeg_tpu.entropy as entropy
from jpeg_tpu.config import BadRleCodeError, BadStreamError
from jpeg_tpu.entropy import numpy_codec as NC


def _rand_levels(rng, n, L, density=0.15, amp=900):
    levels = np.zeros((n, L), dtype=np.int32)
    mask = rng.random((n, L)) < density
    levels[mask] = rng.integers(-amp, amp + 1, size=int(mask.sum()))
    return levels


@pytest.mark.parametrize("n,L,density", [
    (1, 64, 0.2), (37, 64, 0.05), (64, 16, 0.5), (9, 256, 0.02),
    (200, 64, 0.0),      # all-EOB stream
])
def test_scan_matches_stream_geometry(n, L, density):
    rng = np.random.default_rng(n * 1000 + L)
    levels = _rand_levels(rng, n, L, density)
    data = NC.encode_levels(levels)
    starts = NC.scan_offsets(data, n, L)
    # per-block streams re-encode independently to the same offsets
    ends = np.concatenate([starts[1:], [len(data)]])
    for i in range(n):
        assert data[starts[i]:ends[i]] == NC.encode_levels(levels[i:i + 1])


def test_scan_matches_native():
    native = pytest.importorskip("jpeg_tpu.entropy.native_codec")
    if not native.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(7)
    for n, L in [(50, 64), (333, 16), (4, 256)]:
        levels = _rand_levels(rng, n, L, 0.12)
        data = NC.encode_levels(levels)
        np.testing.assert_array_equal(
            NC.scan_offsets(data, n, L), native.scan_offsets(data, n, L))


def test_scan_error_cases():
    L = 16
    levels = np.array([[5, 3, 1, 0] * 4], dtype=np.int32)
    data = NC.encode_levels(levels)
    NC.scan_offsets(data, 1, L)                       # sanity: valid
    with pytest.raises(BadStreamError):
        NC.scan_offsets(data[:-1], 1, L)              # truncated
    with pytest.raises(BadStreamError):
        NC.scan_offsets(data + b"\x00", 1, L)         # trailing bytes
    with pytest.raises(BadStreamError):
        NC.scan_offsets(data, 2, L)                   # too few blocks
    with pytest.raises(BadStreamError):
        NC.scan_offsets(b"", 1, L)                    # empty
    with pytest.raises(BadRleCodeError):
        NC.scan_offsets(bytes([0x30, 0x00]), 1, L)    # (3, 0) invalid code
    # run that overflows the block's coefficient count
    big_run = NC.encode_levels(np.array([[0] * 15 + [1]], dtype=np.int32))
    with pytest.raises(BadStreamError):
        NC.scan_offsets(big_run, 1, 8)                # L=8 < run 15


def test_decode_levels_uses_linear_scan():
    # The quadratic-ish speculative scanner is gone entirely.
    assert not hasattr(NC, "_block_end_bytes")
    rng = np.random.default_rng(3)
    n, L = 4096, 64                                   # ~0.25 MP band
    levels = _rand_levels(rng, n, L, 0.15)
    data = NC.encode_levels(levels)
    np.testing.assert_array_equal(NC.decode_levels(data, n, L), levels)


def test_dispatcher_falls_back_without_native(monkeypatch):
    monkeypatch.setattr(entropy, "_native", None)
    monkeypatch.setattr(entropy, "_native_checked", True)
    levels = np.array([[0, -7, 0, 0, 12, 0, 0, 0, 1] + [0] * 55],
                      dtype=np.int32)
    data = NC.encode_levels(levels)
    np.testing.assert_array_equal(
        entropy.scan_offsets(data, 1, 64), NC.scan_offsets(data, 1, 64))


def test_decode_zero_blocks_rejects_trailing():
    assert NC.decode_levels(b"", 0, 64).shape == (0, 64)
    with pytest.raises(BadStreamError):
        NC.decode_levels(b"\x00", 0, 64)
