"""Block transforms: unnormalized DCT-II (and DFT), fused with zigzag.

TPU-first design note
---------------------
The reference computes the 2-D DCT per block as two passes of 1-D matvecs in
Python loops (reference: transforms.py:46-75) and then gathers the zigzag
order per block in another Python loop (reference: pipeline/zigzag_order.py).
On TPU both collapse into a *single* large matmul: the 2-D transform is
separable, so for a block ``a``:

    vec(A @ a @ A.T) = (A kron A) @ vec(a)

and the zigzag reorder is just a row permutation of ``A kron A``.  So the
whole coefficient path for a batch of N blocks is one
``(N, d*d) @ (d*d, d*d)`` matmul — ideal for the MXU (contraction dim d*d is
64+ instead of d=8) and bandwidth-optimal (one read, one write).  The
elementwise quantization afterwards is fused into the matmul epilogue by XLA.

The DCT matrix is the reference's *unnormalized* DCT-II,
``A[k, n] = cos(pi/N * (n + 0.5) * k)`` (reference: transforms.py:4-11) —
coefficients are ~N times larger than the orthonormal JPEG DCT, which matters
for quantizer semantics.  The inverse is ``B = A_norm.T @ D^-1`` with
row-normalized ``A_norm`` and ``D = diag(row norms)``
(reference: transforms.py:40-44), i.e. ``B = A.T @ D^-2`` — an exact inverse
up to float rounding.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II matrix (float64). Reference: transforms.py:4-11."""
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(n, dtype=np.float64)[None, :]
    return np.cos(np.pi / n * (m + 0.5) * k)


@functools.lru_cache(maxsize=None)
def idct_matrix(n: int) -> np.ndarray:
    """Inverse of :func:`dct_matrix`: ``A_norm.T @ D^-1`` (transforms.py:40-44)."""
    a = dct_matrix(n)
    norms = np.linalg.norm(a, axis=1)
    a_norm = a / norms[:, None]
    return a_norm.T @ np.diag(1.0 / norms)


@functools.lru_cache(maxsize=None)
def zigzag_permutation(n: int) -> np.ndarray:
    """Flat (row-major) block indices in zigzag scan order, shape (n*n,).

    Diagonal walk: up-diagonals from the top-left rows, then from the
    bottom-right columns, with every odd diagonal reversed
    (reference: pipeline/zigzag_order.py:27-80).
    """
    diags = []
    for r in range(n):
        diags.append([(r - t, t) for t in range(r + 1)])
    for c in range(1, n):
        diags.append([(n - 1 - t, c + t) for t in range(n - c)])
    order = []
    for k, d in enumerate(diags):
        if k % 2 == 1:
            d = d[::-1]
        order.extend(i * n + j for i, j in d)
    return np.asarray(order, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def inverse_zigzag_permutation(n: int) -> np.ndarray:
    zz = zigzag_permutation(n)
    inv = np.empty_like(zz)
    inv[zz] = np.arange(n * n, dtype=np.int32)
    return inv


@functools.lru_cache(maxsize=None)
def encode_operator(n: int) -> np.ndarray:
    """(d*d, d*d) matrix ``M`` with ``coeffs_zz = M @ vec(block)``.

    Row ``p`` is row ``zz[p]`` of ``A kron A``: DCT + zigzag in one matmul.
    """
    a = dct_matrix(n)
    m2 = np.kron(a, a)
    return m2[zigzag_permutation(n), :]


@functools.lru_cache(maxsize=None)
def decode_operator(n: int) -> np.ndarray:
    """(d*d, d*d) matrix ``W`` with ``vec(block) = W @ coeffs_zz``.

    Column ``p`` is column ``zz[p]`` of ``B kron B``: dezigzag + IDCT fused.
    """
    b = idct_matrix(n)
    w2 = np.kron(b, b)
    return w2[:, zigzag_permutation(n)]


def _mm_precision():
    # Full-f32 accumulation on the MXU (3-pass bf16); required because pixel
    # blocks have magnitude up to 255*d*d and bf16's 8-bit mantissa is far
    # too coarse for bit-faithful coefficients.
    return jax.lax.Precision.HIGHEST


def dct2_zigzag(blocks_vec, n: int):
    """Batched fused 2-D DCT + zigzag.

    Args:
      blocks_vec: (..., d*d) row-major flattened pixel blocks (float).
      n: dct_size.
    Returns:
      (..., d*d) zigzag-ordered unnormalized DCT-II coefficients.
    """
    m = jnp.asarray(encode_operator(n), dtype=blocks_vec.dtype)
    return jnp.matmul(blocks_vec, m.T, precision=_mm_precision())


def izigzag_idct2(coeffs_zz, n: int):
    """Batched fused dezigzag + inverse 2-D DCT.

    Args:
      coeffs_zz: (..., d*d) zigzag-ordered (dequantized) coefficients.
    Returns:
      (..., d*d) row-major flattened pixel blocks (float, unrounded).
    """
    w = jnp.asarray(decode_operator(n), dtype=coeffs_zz.dtype)
    return jnp.matmul(coeffs_zz, w.T, precision=_mm_precision())


# ---------------------------------------------------------------------------
# DFT mode (reference: pipeline/basis_change.py:20-25, 38-41).
#
# The reference keeps complex coefficients through quantization, but the RLE
# step casts them to int, discarding the imaginary part
# (reference: run_length_encoding.py:16-17 + numpy complex->int cast).  Since
# every quantizer acts elementwise-separately on real/imag, the real part of
# the quantized coefficient equals the quantization of the real part — so the
# encode path only ever needs real(fft2(block)).
# ---------------------------------------------------------------------------

def dft2_real_zigzag(blocks, n: int):
    """(..., d, d) pixel blocks -> (..., d*d) zigzag-ordered real(DFT2)."""
    coeffs = jnp.real(jnp.fft.fft2(blocks))
    zz = jnp.asarray(zigzag_permutation(n))
    flat = coeffs.reshape(coeffs.shape[:-2] + (n * n,))
    return jnp.take(flat, zz, axis=-1)


def izigzag_idft2_real(coeffs_zz, n: int):
    """(..., d*d) zigzag real coefficients -> (..., d, d) real(IDFT2) blocks."""
    inv = jnp.asarray(inverse_zigzag_permutation(n))
    flat = jnp.take(coeffs_zz, inv, axis=-1)
    blocks = flat.reshape(flat.shape[:-1] + (n, n))
    return jnp.real(jnp.fft.ifft2(blocks))
