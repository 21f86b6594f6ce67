"""On-device boundary scan (entropy/device_scan.py): parity with the host
scanners on valid streams, single-flag rejection of everything malformed,
and exact error passthrough via the hybrid wrapper.

The device scan replaces the last serial host stage of decode (reference
rle_byte_stream.py:74-88 walks the stream one code at a time); its contract
is bit-exact starts when ``ok`` and a host rescan (canonical error) when
not.  Runs on CPU here; tpu_tests covers the compiled path on chip.
"""
import os

import numpy as np
import pytest

import jpeg_tpu.entropy as entropy
from jpeg_tpu.config import BadRleCodeError, BadStreamError
from jpeg_tpu.entropy import device_scan as DS
from jpeg_tpu.entropy import numpy_codec as NC


def _rand_levels(rng, n, L, density=0.15, amp=900):
    levels = np.zeros((n, L), dtype=np.int32)
    mask = rng.random((n, L)) < density
    levels[mask] = rng.integers(-amp, amp + 1, size=int(mask.sum()))
    return levels


@pytest.mark.parametrize("n,L,density", [
    (1, 64, 0.2), (37, 64, 0.05), (64, 16, 0.5), (9, 256, 0.02),
    (200, 64, 0.0),      # all-EOB stream: 1-byte blocks
    (5, 1, 0.5),         # dct_size=1: single-coefficient blocks
])
def test_matches_host_scan(n, L, density):
    rng = np.random.default_rng(n * 1000 + L)
    data = NC.encode_levels(_rand_levels(rng, n, L, density))
    starts, ok = DS.scan_offsets_device(data, n, L)
    assert ok
    assert np.array_equal(starts, NC.scan_offsets(data, n, L))


def test_chains_and_extremes():
    # >15-zero runs (chain units), run%15==0 quirk (reference util.py:149-154),
    # max-amplitude codes, trailing-zeros blocks.
    L = 64
    lv = np.zeros((6, L), np.int32)
    lv[0, 63] = 1            # 63 zeros: 4 chains + code
    lv[1, 15] = -5           # run exactly 15: chain + (0,size,amp)
    lv[2, 30] = 16383        # max representable |amp|
    lv[3, :] = -1            # dense block
    lv[4, 0] = 3             # leading code, rest zeros -> immediate EOB
    data = NC.encode_levels(lv)
    starts, ok = DS.scan_offsets_device(data, 6, L)
    assert ok
    assert np.array_equal(starts, NC.scan_offsets(data, 6, L))


def test_rejects_malformed_streams():
    data = NC.encode_levels(np.ones((4, 16), np.int32))
    bad_cases = [
        data[:-1],               # truncated tail
        data[:1],                # truncated mid-block
        data + b"\x00",          # trailing bytes
        data + data,             # trailing blocks
        b"\xff" * 16,            # bad (15, 15) wandering garbage
        b"\x70" * 4,             # (7, 0) invalid code
        b"",                     # empty
    ]
    for bad in bad_cases:
        _, ok = DS.scan_offsets_device(bytes(bad), 4, 16)
        assert not ok, bad[:8]


def test_rejects_coefficient_overflow():
    # A stream whose codes index past L for the declared geometry: encode
    # with L=64, scan claiming L=16.
    lv = np.zeros((1, 64), np.int32)
    lv[0, 40] = 9
    data = NC.encode_levels(lv)
    _, ok = DS.scan_offsets_device(data, 1, 16)
    assert not ok
    with pytest.raises(BadStreamError):
        NC.scan_offsets(data, 1, 16)


def test_hybrid_raises_host_errors():
    data = NC.encode_levels(np.ones((4, 16), np.int32))
    with pytest.raises(BadStreamError):
        DS.scan_offsets_hybrid(data[:-1], 4, 16)
    with pytest.raises(BadStreamError):
        DS.scan_offsets_hybrid(data + b"\x00", 4, 16)
    with pytest.raises(BadRleCodeError):
        DS.scan_offsets_hybrid(b"\x70\x00\x00\x00", 4, 16)
    # valid stream passes through bit-exactly
    assert np.array_equal(DS.scan_offsets_hybrid(data, 4, 16),
                          NC.scan_offsets(data, 4, 16))


def test_fuzz_three_way_with_flag():
    """Differential: device scan vs numpy vs native on random + mutated
    streams, plus the entropy.scan_offsets dispatch under the env flag."""
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(1, 40))
        L = int(rng.choice([16, 64]))
        data = NC.encode_levels(
            _rand_levels(rng, n, L, float(rng.uniform(0, 0.4))))
        ref = NC.scan_offsets(data, n, L)
        got, ok = DS.scan_offsets_device(data, n, L)
        assert ok and np.array_equal(got, ref), trial

        # single-byte mutation: both sides must agree on accept/reject,
        # and on the starts when both accept
        if len(data) == 0:
            continue
        mut = bytearray(data)
        i = int(rng.integers(len(mut)))
        mut[i] ^= 1 << int(rng.integers(8))
        mut = bytes(mut)
        try:
            ref_m = NC.scan_offsets(mut, n, L)
            host_ok = True
        except (BadStreamError, BadRleCodeError):
            host_ok = False
        got_m, dev_ok = DS.scan_offsets_device(mut, n, L)
        assert dev_ok == host_ok, (trial, i)
        if host_ok:
            assert np.array_equal(got_m, ref_m), (trial, i)


def test_env_flag_dispatch(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_DEVICE_SCAN", "1")
    lv = _rand_levels(np.random.default_rng(7), 12, 64)
    data = NC.encode_levels(lv)
    assert np.array_equal(entropy.scan_offsets(data, 12, 64),
                          NC.scan_offsets(data, 12, 64))
    with pytest.raises(BadStreamError):
        entropy.scan_offsets(data[:-1], 12, 64)


def test_end_to_end_decode_with_device_scan(monkeypatch):
    """Full container round-trip with the device scan feeding the device
    bit parser: bytes and planes identical to the default path."""
    monkeypatch.setenv("JPEG_TPU_DEVICE_DECODE", "1")
    from jpeg_tpu import (Configuration, QuantizationMethod, compress_ycbcr,
                          decompress_to_ycbcr)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), np.uint8)
    cfg = Configuration(width=40, height=24, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    blob = compress_ycbcr(img, cfg)
    base = decompress_to_ycbcr(blob)
    monkeypatch.setenv("JPEG_TPU_DEVICE_SCAN", "1")
    assert np.array_equal(decompress_to_ycbcr(blob), base)


@pytest.mark.parametrize("n,L,density", [
    (1, 64, 0.2), (37, 64, 0.05), (64, 16, 0.5),
    (200, 64, 0.0),      # all-EOB stream: 1-byte blocks
])
def test_pallas_walker_matches_host_scan(n, L, density, monkeypatch):
    """The Mosaic funnel walker (interpret mode) == host scan on valid
    streams, including the speculative table's garbage-walker semantics."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    rng = np.random.default_rng(n * 1000 + L + 7)
    data = NC.encode_levels(_rand_levels(rng, n, L, density))
    starts, ok = DS.scan_offsets_device(data, n, L)
    assert ok
    assert np.array_equal(starts, NC.scan_offsets(data, n, L))


def test_pallas_walker_rejects_malformed(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    data = NC.encode_levels(np.ones((4, 16), np.int32))
    for bad in (data[:-1], data + b"\x00", data[1:],
                data[:len(data) // 2]):
        _, ok = DS.scan_offsets_device(bad, 4, 16)
        assert not ok


def test_pallas_walker_mutation_fuzz(monkeypatch):
    """Single-byte mutations: the walker's ok flag must agree with the host
    scanner's accept/reject on every mutant, and starts must match when
    both accept (same differential as test_fuzz_three_way_with_flag)."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    rng = np.random.default_rng(99)
    L = 64
    data = bytearray(NC.encode_levels(_rand_levels(rng, 12, L, 0.2)))
    for _ in range(25):
        i = int(rng.integers(0, len(data)))
        v = int(rng.integers(0, 256))
        mut = bytes(data[:i]) + bytes([v]) + bytes(data[i + 1:])
        try:
            want = NC.scan_offsets(mut, 12, L)
            host_ok = True
        except (BadStreamError, BadRleCodeError):
            host_ok = False
        starts, ok = DS.scan_offsets_device(mut, 12, L)
        assert bool(ok) == host_ok, (i, v)
        if host_ok:
            assert np.array_equal(starts, want), (i, v)

def test_pallas_walker_rung_escalation(monkeypatch):
    """Blocks longer than the first window rung force an escalation to the
    worst-case span; the result must still match the host scan exactly."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    L = 64
    lv = np.zeros((6, L), np.int32)
    lv[2, :] = 16000          # dense max-size block: ~3x the 62-byte rung
    lv[4, ::3] = -1999
    data = NC.encode_levels(lv)
    assert max(np.diff(NC.scan_offsets(data, 6, L))) > DS._SPAN_RUNGS[0]
    DS._rung_cache.pop(L, None)
    starts, ok = DS.scan_offsets_device(data, 6, L)
    assert ok
    assert np.array_equal(starts, NC.scan_offsets(data, 6, L))
    assert DS._rung_cache[L] > 0      # remembered the rung that succeeded
