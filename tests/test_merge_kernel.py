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
    lens[0] = 4 * W              # full first row: zero shift for its partner
    rows[1], lens[1] = 0, 1      # 1-byte row whose content is a zero byte
    rows[2:4], lens[2:4] = 0, 0  # all-pad pair inside a real unit
    _check(rows, lens, m)


_FUZZ_CASES = [(8, 6, 2, "rand"), (16, 7, 1, "min"), (16, 8, 1, "max"),
               (24, 6, 3, "alt"), (32, 7, 1, "padzeros"), (40, 6, 1, "tiny"),
               (48, 6, 2, "rand"), (16, 9, 1, "alt")]


def _run_fuzz_cases(cases):
    rng = np.random.default_rng(42)
    for W, m, nu, mode in cases:
        if ((1 << m) * W) % 128:
            continue
        n = nu << m
        if mode == "rand":
            lens = rng.integers(1, 4 * W + 1, n)
        elif mode == "min":
            lens = np.full(n, 1)
        elif mode == "max":
            lens = np.full(n, 4 * W)
        elif mode == "alt":
            lens = np.where(np.arange(n) % 2, 1, 4 * W)
        elif mode == "padzeros":
            lens = rng.integers(1, 4 * W + 1, n)
            lens[rng.random(n) < 0.5] = 0
        else:
            lens = rng.integers(1, 5, n)
        lens = lens.astype(np.int32)
        rows, _ = _random_rows(n, W, fill=None)
        # impose the case's length pattern on the random rows
        b = np.zeros((n, 4 * W), np.uint32)
        mask = np.arange(4 * W)[None, :] < lens[:, None]
        b[mask] = rng.integers(1, 256, int(mask.sum()))
        sh = (24 - 8 * (np.arange(4 * W) % 4)).astype(np.uint32)
        rows = np.bitwise_or.reduce(
            (b << sh).reshape(n, W, 4), axis=2).astype(np.int32)
        _check(rows, lens, m)


def test_merge_kernel_fuzz_smoke(monkeypatch):
    """Two pattern families in the default run; the full 8-family sweep is
    gated (each distinct (W, m) shape costs a ~5 s interpret trace)."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    _run_fuzz_cases([(8, 6, 2, "rand"), (16, 7, 1, "min")])


@pytest.mark.slow
def test_merge_kernel_fuzz(monkeypatch):
    """All committed pattern-family draws (the in-session 36-draw campaign
    ran clean; these 8 pin each family)."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    _run_fuzz_cases(_FUZZ_CASES)


@pytest.mark.slow
def test_lv_kernel_chunk_append_minimal(monkeypatch):
    """Smallest shape exercising the lv kernel's extra chunk appends: L=80
    allows a 79-zero run -> 5 chains, one more than a 55-bit group carries
    (ops/pallas_kernels.py:_encode_stream_lv_kernel n_sub=1).  The full
    multi-pattern L=144 sweep is gated (interpret traces ~1 s per slot)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setenv("JPEG_TPU_ENC_LV", "1")
    monkeypatch.setattr(PK, "ENC_TILE", 16)
    L = 80
    lv = np.zeros((3, L), np.int32)
    lv[0, L - 1] = 5                           # maximal 79-zero run
    lv[1, 0] = -3                              # all-trailing-zero block
    want = NC.encode_levels(lv)
    buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
    buf, total = np.asarray(buf), int(np.asarray(bb).sum())
    assert buf[:total].tobytes() == want and not buf[total:].any()


@pytest.mark.slow
def test_lv_kernel_long_runs(monkeypatch):
    """Zero-runs longer than 74 need > 4 chain bytes — more than a 55-bit
    funnel group carries.  The lv kernel splits them into static extra
    chunk appends (ops/pallas_kernels.py:_encode_stream_lv_kernel); the
    pre-fix kernel paths corrupted such streams silently (any dct_size
    >= 10 band with smooth content)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setenv("JPEG_TPU_ENC_LV", "1")
    monkeypatch.setattr(PK, "ENC_TILE", 16)
    L = 144                                    # 9 chains max: 4 + 4 + 1
    lv = np.zeros((8, L), np.int32)
    lv[1, L - 1] = 5                           # maximal 143-zero run
    lv[2, 0] = -3                              # all-trailing-zero block
    lv[3, 75] = 7
    lv[3, L - 1] = -9                          # two long runs in one block
    lv[4, 60] = 1                              # exactly 4 chains (no chunk)
    lv[5, 76] = 2                              # 5 chains (1-byte chunk)
    want = NC.encode_levels(lv)
    buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
    buf, total = np.asarray(buf), int(np.asarray(bb).sum())
    assert buf[:total].tobytes() == want and not buf[total:].any()


@pytest.mark.slow
def test_lv_kernel_matches_tables_path(monkeypatch):
    """For L <= 75 the in-kernel unit groups must reproduce the XLA-tables
    path bit for bit (rows AND block bytes)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    for L, density in [(16, 0.3), (64, 0.0), (64, 0.15), (64, 1.0)]:
        lv = np.zeros((70, L), np.int32)
        mask = RNG.random(lv.shape) < density
        lv[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        W = DC.encode_words_full(L)
        r1, b1 = jax.jit(
            lambda x, W=W: PK.encode_stream_rows_lv(x, W))(jnp.asarray(lv))
        cb, vh, vl, b0 = jax.jit(DC._unit_groups)(jnp.asarray(lv))
        r0 = jax.jit(
            lambda a, b, c, W=W: PK.encode_stream_rows(a, b, c, W))(
                cb, vh, vl)
        assert np.array_equal(np.asarray(b1), np.asarray(b0))
        assert np.array_equal(np.asarray(r1), np.asarray(r0))


def test_lv_kernel_matches_tables_path_smoke(monkeypatch):
    """One small-L lv-vs-tables equivalence case in the default run (the
    L=64 cases cost a ~25 s interpret trace each; full sweep gated, and the
    on-chip suite covers the compiled L=64 kernels directly)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    L = 16
    lv = np.zeros((70, L), np.int32)
    mask = RNG.random(lv.shape) < 0.3
    lv[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
    W = DC.encode_words_full(L)
    r1, b1 = jax.jit(
        lambda x: PK.encode_stream_rows_lv(x, W))(jnp.asarray(lv))
    cb, vh, vl, b0 = jax.jit(DC._unit_groups)(jnp.asarray(lv))
    r0 = jax.jit(
        lambda a, b, c: PK.encode_stream_rows(a, b, c, W))(cb, vh, vl)
    assert np.array_equal(np.asarray(b1), np.asarray(b0))
    assert np.array_equal(np.asarray(r1), np.asarray(r0))


def test_merge_kernel_in_encode_stream(monkeypatch):
    """encode_stream routes through the kernel merge on the Pallas path;
    bytes must equal the host codec."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    lv = np.zeros((140, 64), np.int32)
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
