"""Class-level drop-in API surface: DCT, Zigzag, quantizers, RunLengthBlock.

These mirror the reference's object APIs over the vectorized internals;
where the reference is importable, behavior is checked against it directly.
"""
import warnings

import numpy as np
import pytest

from tests import reference_oracle

from jpeg_tpu.config import BadArrayShapeError, Configuration
from jpeg_tpu.entropy.bitio import RunLengthBlock, RunLengthCode
from jpeg_tpu.ops.quantize import (DiscardingQuantizer, DivisionQuantizer,
                                   JpegQuantizationTable, RoundingQuantizer,
                                   quantizer_for)
from jpeg_tpu.ops.transform import (DCT, Zigzag, dct_matrix,
                                    dct_matrix_normalized,
                                    normalization_matrix)

RNG = np.random.default_rng(21)


def test_dct_class_roundtrip():
    d = DCT(8)
    x = RNG.uniform(-100, 100, 8)
    np.testing.assert_allclose(d.transform_1d_inverse(d.transform_1d(x)), x,
                               rtol=1e-10)
    a = RNG.uniform(0, 255, (8, 8))
    np.testing.assert_allclose(d.transform_2d_inverse(d.transform_2d(a)), a,
                               rtol=1e-10)


@pytest.mark.skipif(not reference_oracle.available(), reason="no reference")
def test_dct_matrices_bitwise_match_reference():
    ref = reference_oracle.load()
    for n in (2, 8, 24):
        np.testing.assert_array_equal(dct_matrix(n),
                                      ref.transforms.dct_matrix(n))
        np.testing.assert_array_equal(
            dct_matrix_normalized(n), ref.transforms.dct_matrix_normalized(n))
        np.testing.assert_array_equal(
            normalization_matrix(n), ref.transforms.normalization_matrix(n))


def test_zigzag_class():
    z = Zigzag(3)
    block = np.arange(9).reshape(3, 3)
    order = z.zigzag_order(block)
    np.testing.assert_array_equal(order, [0, 1, 3, 6, 4, 2, 5, 7, 8])
    np.testing.assert_array_equal(z.restore(order).reshape(3, 3), block)
    with pytest.raises(BadArrayShapeError):
        z.zigzag_order(np.zeros((2, 2)))
    with pytest.raises(BadArrayShapeError):
        z.restore(np.zeros(4))


def test_quantizer_classes():
    a = RNG.uniform(-500, 500, (8, 8))
    assert np.array_equal(RoundingQuantizer().quantize(a), np.round(a))
    dq = DiscardingQuantizer(keep=2)
    q = dq.quantize(a)
    assert q[2:].sum() == 0 and q[:, 2:].sum() == 0
    np.testing.assert_array_equal(q[:2, :2], np.round(a)[:2, :2])
    dv = DivisionQuantizer(divisor=40)
    np.testing.assert_array_equal(dv.restore(dv.quantize(a)),
                                  np.round(a / 40.0) * 40)
    jt = JpegQuantizationTable()
    np.testing.assert_array_equal(jt.quantize(a),
                                  np.round(a * (1.0 / jt.table)))
    from jpeg_tpu.config import QuantizationMethod
    assert isinstance(quantizer_for(QuantizationMethod("divide", divisor=3)),
                      DivisionQuantizer)


@pytest.mark.skipif(not reference_oracle.available(), reason="no reference")
def test_runlength_block_parity():
    ref = reference_oracle.load()
    z = np.zeros(64)
    z[[0, 3, 40, 63]] = [12.4, -7, 3, 1]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = ref.pipeline.run_length_encoding.RunLengthBlock(64).encode(z)
        ours = RunLengthBlock(64).encode(z)
    assert [c.as_tuple() for c in ours] == [c.as_tuple() for c in theirs]
    decoded = RunLengthBlock(64).decode(ours)
    want = np.zeros(64)
    want[[0, 3, 40, 63]] = [12, -7, 3, 1]
    np.testing.assert_array_equal(decoded, want)


def test_apply_blockwise_vectorized():
    from jpeg_tpu import steps
    cfg = Configuration(width=8, height=8, block_size=2)
    step = steps.Normalization(cfg)
    a = np.arange(64, dtype=np.float64).reshape(8, 8)
    res = np.zeros((8, 8))
    out = step.apply_blockwise(a, lambda blk: blk * 2.0, 4, res)
    np.testing.assert_array_equal(np.asarray(out), a * 2)
    np.testing.assert_array_equal(res, a * 2)
    got = [(y, x) for _, y, x in step.blocks(a, 4)]
    assert got == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_file_format_helper_surface():
    from jpeg_tpu import container as C
    assert C.pack_integer(513) == b"\x01\x02"
    assert C.unpack_integer(b"\x01\x02") == 513
    assert C.pack_long(70000) == C.pack_long(70000)
    assert C.unpack_long(C.pack_long(70000)) == 70000
    assert C.unpack_string(C.pack_string("DCT")) == "DCT"
    r = C.Reader(b"\x05\x00ABCD\x01\x00\x00\x00")
    assert C.unpack_integer(r.read_short()) == 5
    assert r.read(4) == b"ABCD"
    assert C.unpack_long(r.read_long()) == 1


def test_block_columns_match_blockify():
    from jpeg_tpu.utils import arrays as UA
    a = np.arange(48).reshape(6, 8)
    blocks = UA.split_into_blocks(a, 2)
    for j, col in UA.block_columns(a, 2):
        for y in range(3):
            np.testing.assert_array_equal(
                UA.extract_nth_block(col, 2, y), blocks[y, j])
