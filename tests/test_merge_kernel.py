"""Mosaic merge kernel == XLA pairwise merge, bit for bit.

The kernel (ops/pallas_kernels.py:_merge_rows_kernel) runs all MERGE_DEPTH
pairwise byte-concat rounds of the encode compaction in VMEM; the XLA
formulation (entropy/device_codec.py:_merge_rows) is the reference and the
no-Pallas fallback.  Wrong shift masks corrupt stream bytes silently, so
every case checks exact unit words and lengths, plus end-to-end stream
bytes against the host codec.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jpeg_tpu.entropy import device_codec as DC
from jpeg_tpu.entropy import numpy_codec as NC

RNG = np.random.default_rng(11)


def _random_rows(n, W, fill=None):
    """Top-justified big-endian byte rows with random lengths 1..4W."""
    lens = RNG.integers(1, 4 * W + 1, n).astype(np.int32)
    if fill is not None:
        lens[:] = fill
    b = np.zeros((n, 4 * W), np.uint32)
    mask = np.arange(4 * W)[None, :] < lens[:, None]
    b[mask] = RNG.integers(0, 256, int(mask.sum()))
    sh = (24 - 8 * (np.arange(4 * W) % 4)).astype(np.uint32)
    rows = np.bitwise_or.reduce(
        (b << sh).reshape(n, W, 4), axis=2).astype(np.int32)
    return rows, lens


def _check(rows, lens, m):
    want_u, want_l = jax.jit(
        lambda r, l: DC._merge_rows(r, l, m))(rows, jnp.asarray(lens))
    got_u, got_l = jax.jit(
        lambda r, l: DC._merge_rows_device(r, l, m))(rows, jnp.asarray(lens))
    assert np.array_equal(np.asarray(want_l), np.asarray(got_l))
    assert np.array_equal(np.asarray(want_u), np.asarray(got_u))


@pytest.mark.parametrize("W", [8, 16, 24, 48])
def test_merge_kernel_matches_xla(W, monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    m = 9 if (W << 9) % 128 == 0 else 6
    rows, lens = _random_rows(1 << m, W)
    _check(rows, lens, m)


def test_merge_kernel_multi_unit_and_edges(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    W, m = 16, 7
    # 3 units; lengths hitting both extremes (empty rows pad, full rows)
    rows, lens = _random_rows(3 << m, W)
    lens[0] = 4 * W            # full first row: zero shift for its partner
    rows[1], lens[1] = 0, 0    # wait: len 0 rows only exist as unit padding
    lens[1] = 1
    rows[2:4], lens[2:4] = 0, 0  # all-pad pair inside a real unit
    _check(rows, lens, m)


def test_merge_kernel_in_encode_stream(monkeypatch):
    """encode_stream routes through the kernel merge on the Pallas path;
    bytes must equal the host codec."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    lv = np.zeros((700, 64), np.int32)
    mask = RNG.random(lv.shape) < 0.2
    lv[mask] = RNG.integers(-8000, 8000, int(mask.sum()))
    want = NC.encode_levels(lv)
    buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
    buf, total = np.asarray(buf), int(np.asarray(bb).sum())
    assert buf[:total].tobytes() == want and not buf[total:].any()
    # forced-XLA merge produces the same bytes (fallback parity)
    monkeypatch.setenv("JPEG_TPU_MERGE_XLA", "1")
    buf2, bb2 = jax.jit(lambda x: DC.encode_stream(x))(jnp.asarray(lv))
    assert np.asarray(buf2)[:total].tobytes() == want
