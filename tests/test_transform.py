"""DCT/DFT and zigzag tests (mirrors reference basis_change/zigzag tests)."""
import numpy as np
import pytest

from jpeg_tpu.ops import transform as T


@pytest.mark.parametrize("n", [1, 2, 4, 8, 24])
def test_dct_matrix_is_unnormalized_dct2(n):
    a = T.dct_matrix(n)
    for k in range(n):
        for m in range(n):
            assert a[k, m] == pytest.approx(np.cos(np.pi / n * (m + 0.5) * k))


@pytest.mark.parametrize("n", [1, 2, 8, 24])
def test_idct_matrix_inverts(n):
    a = T.dct_matrix(n)
    b = T.idct_matrix(n)
    assert np.allclose(b @ a, np.eye(n), atol=1e-12)


def test_zigzag_4x4_golden():
    # Standard zigzag scan of a 4x4 block, as produced by the reference
    # diagonal walk (pipeline/zigzag_order.py).
    zz = T.zigzag_permutation(4)
    grid = np.arange(16).reshape(4, 4)
    expected = [grid[i, j] for i, j in
                [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                 (0, 3), (1, 2), (2, 1), (3, 0), (3, 1), (2, 2),
                 (1, 3), (2, 3), (3, 2), (3, 3)]]
    assert list(zz) == expected


def test_zigzag_3x3_golden():
    zz = T.zigzag_permutation(3)
    expected_coords = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                       (1, 2), (2, 1), (2, 2)]
    assert list(zz) == [i * 3 + j for i, j in expected_coords]


def test_zigzag_inverse_permutation():
    for n in (1, 3, 8, 24):
        zz = T.zigzag_permutation(n)
        inv = T.inverse_zigzag_permutation(n)
        assert np.array_equal(zz[inv], np.arange(n * n))
        assert np.array_equal(inv[zz], np.arange(n * n))


@pytest.mark.parametrize("n", [2, 8])
def test_fused_dct_zigzag_equals_two_stage(n):
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, size=(5, n, n)).astype(np.float64)
    a = T.dct_matrix(n)
    expected = np.einsum("kn,bnm,lm->bkl", a, blocks, a)
    expected = expected.reshape(5, n * n)[:, T.zigzag_permutation(n)]
    got = np.asarray(T.dct2_zigzag(blocks.reshape(5, n * n), n))
    assert np.allclose(got, expected, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("n", [2, 8, 24])
def test_dct_roundtrip(n):
    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 256, size=(7, n * n)).astype(np.float64)
    coeffs = T.dct2_zigzag(blocks, n)
    rec = np.asarray(T.izigzag_idct2(coeffs, n))
    assert np.allclose(rec, blocks, atol=1e-8)


def test_dft_real_matches_numpy():
    rng = np.random.default_rng(2)
    blocks = rng.integers(0, 256, size=(3, 8, 8)).astype(np.float64)
    got = np.asarray(T.dft2_real_zigzag(blocks, 8))
    expected = np.real(np.fft.fft2(blocks)).reshape(3, 64)[
        :, T.zigzag_permutation(8)]
    assert np.allclose(got, expected, atol=1e-9)


def test_dft_real_roundtrip_recovers_even_part():
    # Keeping only real(DFT) reconstructs the circularly-even part of the
    # signal: (x[n] + x[-n mod N]) / 2.  Exact for even-symmetric blocks.
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8))
    even = (x + x[:, (-np.arange(8)) % 8][:, :, (-np.arange(8)) % 8]) / 2
    coeffs = T.dft2_real_zigzag(even, 8)
    rec = np.asarray(T.izigzag_idft2_real(coeffs, 8))
    assert np.allclose(rec.reshape(2, 8, 8), even, atol=1e-9)
    # and for a general block it returns exactly the even part
    coeffs2 = T.dft2_real_zigzag(x, 8)
    rec2 = np.asarray(T.izigzag_idft2_real(coeffs2, 8)).reshape(2, 8, 8)
    assert np.allclose(rec2, even, atol=1e-9)
