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


def test_subsample_fast_hw_batch_matches_2d():
    # the batch-polymorphic fast path must equal per-plane 2-D calls
    # bit-for-bit (same pinned f32 add order)
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, (3, 13, 22), dtype=np.int32)
    for bs in (1, 2, 3, 4):
        got = np.asarray(B.subsample_fast_hw(batch, bs))
        want = np.stack(
            [np.asarray(B.subsample_fast(batch[i], bs)) for i in range(3)])
        assert got.dtype == np.float32
        assert np.array_equal(got, want), bs


def test_subsample_fast_matches_mean_pool():
    # rows-then-cols strided adds compute the exact mean pool in f64 terms
    # (values are small integers: every partial sum is exact in f32)
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (12, 20), dtype=np.int32)
    for bs in (2, 4):
        got = np.asarray(B.subsample_fast(a, bs)).astype(np.float64)
        want = a.reshape(12 // bs, bs, 20 // bs, bs).mean(axis=(1, 3))
        assert np.allclose(got, want, rtol=0, atol=1e-4)


def test_pad_edge_hw_batch_matches_2d():
    rng = np.random.default_rng(5)
    batch = rng.integers(0, 256, (2, 10, 17), dtype=np.int32)
    for f in (3, 8):
        got = np.asarray(B.pad_edge_hw(batch, f))
        want = np.stack(
            [np.asarray(B.pad_edge(batch[i], f)) for i in range(2)])
        assert np.array_equal(got, want), f
