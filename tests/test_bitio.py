"""Bit-IO class surface: parity with the reference's code objects."""
import warnings

import numpy as np
import pytest

from tests import reference_oracle

from jpeg_tpu.config import BadRleCodeError
from jpeg_tpu.entropy.bitio import BitDecoder, BitEncoder, Bits, RunLengthCode
from jpeg_tpu.parallel import multihost
from jpeg_tpu.utils import arrays as UA


def test_bits_roundtrip():
    b = Bits("0100001111")
    assert b.to01() == "0100001111"
    assert len(b) == 10
    raw = b.tobytes()
    c = Bits()
    c.frombytes(raw)
    assert c.to01()[:10] == b.to01()
    assert (Bits("01") + Bits("10")).to01() == "0110"


def test_bit_encoder_patterns():
    enc = BitEncoder()
    assert enc.encode_unsigned(4).to01() == "100"
    assert enc.pad_bitstring(enc.encode_unsigned(4)).to01() == "0100"
    assert enc.encode_signed(6).to01() == "1110"     # '1' = positive
    assert enc.encode_signed(-6).to01() == "0110"


def test_bit_decoder():
    d = BitDecoder(Bits("0100" + "0011" + "110" + "0" * 13))
    assert d.decode_unsigned(4) == 4
    assert d.decode_unsigned(4) == 3
    assert d.decode_signed(3) == 2
    d.skip_padding()
    assert d._pos == 16


def test_runlength_code_chains_and_bits():
    codes = RunLengthCode.encode(33, -5)
    assert [c.as_tuple() for c in codes] == [(15, 0, 0), (15, 0, 0),
                                             (3, 4, -5)]
    assert codes[0].as_bitstring().to01() == "11110000"
    assert codes[2].as_bitstring().to01() == "0011" + "0100" + "0101"
    assert RunLengthCode.EOB().as_bitstring().to01() == "00000000"
    assert RunLengthCode(15, 0, 0).decode() == [0] * 15
    assert RunLengthCode(2, 3, 3).decode() == [0, 0, 3]


def test_runlength_code_validation():
    for bad in [(1, 0, 0), (16, 0, 0), (0, 16, 0), (0, 0, 5)]:
        with pytest.raises(BadRleCodeError):
            RunLengthCode(*bad)


@pytest.mark.skipif(not reference_oracle.available(), reason="no reference")
def test_bitstring_parity_with_reference():
    ref = reference_oracle.load()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for run, amp in [(0, 1), (3, -5), (14, 100), (15, 7), (33, -16383)]:
            ours = RunLengthCode.encode(run, amp)
            theirs = ref.util.RunLengthCode.encode(run, amp)
            assert [c.as_tuple() for c in ours] == \
                   [c.as_tuple() for c in theirs]
            assert [c.as_bitstring().to01() for c in ours] == \
                   [c.as_bitsring().to01() for c in theirs]


def test_reference_named_array_utils():
    a = np.arange(12).reshape(3, 4)
    p = UA.pad_array(a, 4)
    assert p.shape == (4, 4)
    np.testing.assert_array_equal(p[3], p[2])         # edge replication
    np.testing.assert_array_equal(UA.undo_pad_array(p, (1, 0)), a)
    blocks = UA.split_into_blocks(np.arange(16).reshape(4, 4), 2)
    assert blocks.shape == (2, 2, 2, 2)
    np.testing.assert_array_equal(blocks[0, 0], [[0, 1], [4, 5]])
    inf = UA.inflate(np.array([[1, 2]]), 2)
    np.testing.assert_array_equal(inf, [[1, 1, 2, 2], [1, 1, 2, 2]])


def test_multihost_single_process_degenerates():
    from jpeg_tpu import Configuration, QuantizationMethod, parallel, entropy
    from jpeg_tpu.ops.band import encode_band_levels
    cfg = Configuration(width=32, height=64, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    plane = np.random.default_rng(0).integers(0, 256, (64, 32), np.int64)
    got = multihost.compress_plane_distributed(plane, cfg)
    want = entropy.encode_levels(np.asarray(encode_band_levels(plane, cfg)))
    assert got == want
    # initialize() must be a no-op for one process
    multihost.initialize()
