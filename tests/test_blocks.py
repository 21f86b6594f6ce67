"""Pixel-domain op tests (mirrors reference util/padding/subsample tests)."""
import numpy as np
import pytest

from jpeg_tpu.config import BadArrayShapeError, EmptyArrayError, padded_size
from jpeg_tpu.ops import blocks as B


def test_pad_edge_replicates_last_row_col():
    a = np.array([[1, 2],
                  [3, 4]])
    res = np.asarray(B.pad_edge(a, 3))
    expected = np.array([[1, 2, 2],
                         [3, 4, 4],
                         [3, 4, 4]])
    assert np.array_equal(res, expected)


def test_pad_edge_noop_when_multiple():
    a = np.arange(18).reshape(6, 3)
    assert np.array_equal(np.asarray(B.pad_edge(a, 3)), a)
    assert np.asarray(B.pad_edge(a, 2)).shape == (6, 4)


def test_pad_edge_rejects_bad_shapes():
    with pytest.raises(BadArrayShapeError):
        B.pad_edge(np.zeros((2, 2, 2)), 2)
    with pytest.raises(EmptyArrayError):
        B.pad_edge(np.zeros((0, 4)), 2)
    with pytest.raises(EmptyArrayError):
        B.pad_edge(np.zeros((4, 0)), 2)


def test_padded_size_table():
    assert padded_size(5, 3) == 6
    assert padded_size(6, 3) == 6
    assert padded_size(1, 3) == 3
    assert padded_size(16, 8) == 16
    assert padded_size(17, 8) == 24


def test_subsample_mean_values_bs2():
    a = np.array([[1, 3, 5, 7],
                  [5, 7, 9, 11],
                  [0, 0, 4, 4],
                  [2, 2, 0, 0]])
    res = np.asarray(B.subsample(a, 2))
    assert np.array_equal(res, np.array([[4.0, 8.0], [1.0, 2.0]]))


def test_subsample_then_inflate_shapes():
    a = np.arange(64).reshape(8, 8)
    s = B.subsample(a, 4)
    assert s.shape == (2, 2)
    up = np.asarray(B.inflate(s, 4))
    assert up.shape == (8, 8)
    assert np.all(up[:4, :4] == np.mean(a[:4, :4]))


def test_subsample_pads_smaller_than_block():
    a = np.array([[1, 2],
                  [3, 4]])
    res = np.asarray(B.subsample(a, 4))
    # padded by edge replication to 4x4, then one mean
    padded = np.asarray(B.pad_edge(a, 4))
    assert res.shape == (1, 1)
    assert res[0, 0] == np.mean(padded)


def test_blockify_deblockify_roundtrip():
    a = np.arange(48).reshape(6, 8)
    blk = B.blockify(a, 2)
    assert blk.shape == (3, 4, 2, 2)
    assert np.array_equal(np.asarray(blk[0, 0]), a[:2, :2])
    assert np.array_equal(np.asarray(blk[2, 3]), a[4:6, 6:8])
    assert np.array_equal(np.asarray(B.deblockify(blk)), a)


def test_blockify_complex_dtype():
    a = (np.arange(16) + 1j * np.arange(16)).reshape(4, 4)
    blk = np.asarray(B.blockify(a, 2))
    assert blk.dtype.kind == "c"
    assert np.array_equal(blk[1, 1], a[2:4, 2:4])
