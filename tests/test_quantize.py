"""Quantizer semantics tests (mirrors reference quantization_tests.py, plus
qtable coverage the reference lacks)."""
import numpy as np
import pytest

from jpeg_tpu.config import BadQuantizationError, QuantizationMethod
from jpeg_tpu.ops import quantize as Q
from jpeg_tpu.ops.transform import zigzag_permutation


def _roundtrip_2d(block, method, n):
    """Apply quantize+dequantize through the zigzag domain, return 2D."""
    zz = zigzag_permutation(n)
    flat = np.asarray(block, dtype=np.float64).reshape(-1)[zz]
    q = np.asarray(Q.quantize(flat, method, n))
    deq = np.asarray(Q.dequantize(q.astype(np.int64), method, n))
    out = np.zeros(n * n)
    out[zz] = deq
    return out.reshape(n, n), q


def test_rounding_quantizer():
    m = QuantizationMethod("none")
    a = np.array([1.4, 1.5, 2.5, -1.5, -0.4])
    got = np.asarray(Q.quantize(a, m, 8))
    # np.round = round-half-to-even
    assert got.tolist() == [1.0, 2.0, 2.0, -2.0, -0.0]
    deq = np.asarray(Q.dequantize(got.astype(np.int64), m, 8))
    assert deq.tolist() == [1, 2, 2, -2, 0]


def test_discard_quantizer_masks_rows_and_cols():
    m = QuantizationMethod("discard", keep=2)
    n = 4
    block = np.arange(16, dtype=np.float64).reshape(4, 4) + 0.3
    out2d, _ = _roundtrip_2d(block, m, n)
    expected = np.round(block)
    expected[2:, :] = 0
    expected[:, 2:] = 0
    assert np.array_equal(out2d, expected)


def test_divide_quantizer_values():
    m = QuantizationMethod("divide", divisor=10)
    a = np.array([14.0, 15.0, 26.0, -26.0])
    got = np.asarray(Q.quantize(a, m, 8))
    assert got.tolist() == [1.0, 2.0, 3.0, -3.0]
    deq = np.asarray(Q.dequantize(got.astype(np.int64), m, 8))
    assert deq.tolist() == [10, 20, 30, -30]


def test_qtable_quantizer_golden():
    m = QuantizationMethod("qtable")
    n = 8
    block = np.full((8, 8), 100.0)
    zz = zigzag_permutation(n)
    flat = block.reshape(-1)[zz]
    q = np.asarray(Q.quantize(flat, m, n))
    out = np.zeros(64)
    out[zz] = q
    out = out.reshape(8, 8)
    expected = np.round(100.0 / Q.JPEG_QTABLE)
    assert np.array_equal(out, expected)
    # restore = round(a * q)
    deq = np.asarray(Q.dequantize(q.astype(np.int64), m, n))
    out2 = np.zeros(64)
    out2[zz] = deq
    assert np.array_equal(out2.reshape(8, 8), expected * Q.JPEG_QTABLE)


def test_qtable_requires_dct8():
    from jpeg_tpu.config import Configuration
    with pytest.raises(BadQuantizationError):
        Configuration(width=4, height=4, dct_size=4,
                      quantization=QuantizationMethod("qtable"))


def test_quantization_method_json_roundtrip_and_key_order():
    m = QuantizationMethod("divide", divisor=1000)
    s = m.to_json()
    # params first, then scheme name — part of the wire format
    assert s == '{"divisor": 1000, "quantization_scheme_name": "divide"}'
    m2 = QuantizationMethod.from_json(s)
    assert m2 == m
    assert QuantizationMethod("none").to_json() == \
        '{"quantization_scheme_name": "none"}'


def test_bad_quantization_names():
    with pytest.raises(BadQuantizationError):
        QuantizationMethod("nope")
    with pytest.raises(BadQuantizationError):
        QuantizationMethod("divide", wrong_param=3)
