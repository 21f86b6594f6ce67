"""Content-sized two-phase device encode: bit-identical to the host codec.

The sized path (api.py:_encode3_levels_stats_fn + _entropy_sized_fn,
entropy/device_codec.py:encode_stream_sized) runs the funnel kernel, merges
and compaction gather on row widths / output caps derived from the band's
actual content instead of the 23-bit/coefficient worst case.  Wrong sizing
corrupts bytes silently, so every test compares against the host codec.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jpeg_tpu.entropy import device_codec as DC
from jpeg_tpu.entropy import numpy_codec as NC

RNG = np.random.default_rng(23)


def test_width_buckets():
    full = DC.encode_words_full(64)
    assert full == 48                            # L=64 worst case = 185 B
    assert DC.encode_words_bucket(64, 0) == full
    assert DC.encode_words_bucket(64, 185) == full
    assert DC.encode_words_bucket(64, 9999) == full
    assert DC.encode_words_bucket(64, 1) == 2
    assert DC.encode_words_bucket(64, 8) == 2    # 2 words hold 8 bytes
    assert DC.encode_words_bucket(64, 9) == 4
    assert DC.encode_words_bucket(64, 40) == 10  # even-word fine buckets
    assert DC.encode_words_bucket(64, 65) == 20  # multiples of 4 past 16
    assert DC.encode_words_bucket(64, 130) == 40  # multiples of 8 past 32
    prev = 0
    for bb in range(1, DC.worst_case_block_bytes(64) + 1):
        W = DC.encode_words_bucket(64, bb)
        # even widths keep (2**depth * W) % 128 == 0 for any depth >= 6
        assert W % 2 == 0 and 4 * W >= bb        # merge tiling + capacity
        assert W >= prev                         # monotone in max_bb
        prev = W
    # large L: geometric growth keeps the bucket count small
    full576 = DC.encode_words_full(576)
    widths = {DC.encode_words_bucket(576, bb)
              for bb in range(1, DC.worst_case_block_bytes(576) + 1, 7)}
    assert len(widths) <= 24 and max(widths) == full576


def test_cap_buckets():
    worst = 10_000_000
    assert DC.encode_cap_bucket(0, worst) == 65536
    assert DC.encode_cap_bucket(1, worst) == 65536
    caps = set()
    for total in range(1, 9_000_000, 9973):
        cap = DC.encode_cap_bucket(total, worst)
        assert total <= cap <= worst
        caps.add(cap)
    assert len(caps) <= 16                       # logarithmic program count
    assert DC.encode_cap_bucket(20_000_000, worst) == worst


def test_gather_group_bucket():
    # Unconstrained (fewer than two real units): structural limits only.
    assert DC.gather_group_bucket(2 ** 30, 1024, 8) == DC.GATHER_G_MAX
    # Content bound: 4*G <= min_unit.
    assert DC.gather_group_bucket(64, 4096, 8) == 16
    assert DC.gather_group_bucket(63, 4096, 8) == 8
    assert DC.gather_group_bucket(1536, 4096, 8) == 256
    # Structural bound: (2**depth * W) % G == 0 (W=10 -> v2(Wu) = m+1).
    m = DC.effective_depth(4096)
    assert DC.gather_group_bucket(2 ** 30, 4096, 10) == min(
        DC.GATHER_G_MAX, 1 << (m + 1))


def test_min_unit_bytes_of():
    u = 1 << DC.effective_depth(3 * 1024)
    # Three full units of 3-byte blocks + pad: last real unit excluded.
    bb = np.full(3 * u, 3, np.int32)
    bb[-1] = 1                                   # short tail block
    got = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb)))
    assert got == 3 * u                          # units 0..1 constrain
    # A single real unit constrains nothing.
    assert int(jax.jit(DC.min_unit_bytes_of)(
        jnp.asarray(np.full(u, 3, np.int32)))) == 2 ** 30


def test_sized_oversized_gather_group_poisons(monkeypatch):
    """A G whose 4*G exceeds a constraining unit must zero the buffer and
    raise via check_sized_ok, never mis-attribute gather groups silently."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    monkeypatch.setattr(DC, "MERGE_DEPTH", 6)
    u = 1 << 6
    levels = np.zeros((3 * u, 16), np.int32)
    levels[:, 0] = 100                           # ~3-byte blocks: units ~192B
    n = levels.shape[0]
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(levels)))
    W = DC.encode_words_bucket(16, int(bb.max()))
    cap = DC.encode_cap_bucket(
        int(bb.sum()), n * DC.worst_case_block_bytes(16))
    mu = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb)))
    bad_G = DC.gather_group_bucket(mu, n, W) * 2
    assert 4 * bad_G > mu
    buf, _, bad = jax.jit(lambda lv: DC.encode_stream_sized(
        lv, W, cap, bad_G))(jnp.asarray(levels))
    assert bool(bad) and not np.asarray(buf).any()
    with pytest.raises(ValueError):
        DC.check_sized_ok(bad)
    # The legal bucket at the same shapes is exact.
    _check_sized(levels)


def _check_sized(levels, W=None, cap=None, G=None):
    """encode_stream_sized output == host bytes, remainder zero."""
    levels = np.asarray(levels, np.int32)
    want = NC.encode_levels(levels)
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(levels)))
    max_bb, total = int(bb.max()), int(bb.sum())
    assert total == len(want)                    # geometry agrees with host
    L = levels.shape[-1]
    if W is None:
        W = DC.encode_words_bucket(L, max_bb)
    if cap is None:
        cap = DC.encode_cap_bucket(
            total, levels.shape[0] * DC.worst_case_block_bytes(L))
    if G is None:
        mu = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb)))
        G = DC.gather_group_bucket(mu, levels.shape[0], W)
    buf, _, bad = jax.jit(
        lambda lv: DC.encode_stream_sized(lv, W, cap, G))(jnp.asarray(levels))
    assert not bool(bad)
    buf = np.asarray(buf)
    assert buf.shape[0] == min(
        cap, levels.shape[0] * DC.worst_case_block_bytes(L))
    assert buf[:total].tobytes() == want
    assert not buf[total:].any()


@pytest.mark.parametrize("L", [16, 64])
def test_sized_matches_host(L, monkeypatch):
    import os
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    densities = ((0.0, 0.08, 0.5, 1.0)
                 if os.environ.get("JPEG_TPU_SLOW_TESTS") else (0.08, 1.0))
    for density in densities:
        levels = np.zeros((37, L), dtype=np.int32)
        mask = RNG.random(levels.shape) < density
        levels[mask] = RNG.integers(-16383, 16384, int(mask.sum()))
        _check_sized(levels)


def test_sized_exact_width_and_cap(monkeypatch):
    """Tightest legal sizes: W exactly ceil(max_bb/4) rounded to 8 and
    cap == total (no bucket slack anywhere)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    levels = np.zeros((70, 64), dtype=np.int32)
    for i in range(70):
        k = int(RNG.integers(0, 20))
        levels[i, :k] = RNG.integers(-100, 100, k)
    bb = np.asarray(DC.block_bytes_of(jnp.asarray(levels)))
    W = -(-int(bb.max()) // 4 // 8) * 8 or 8
    _check_sized(levels, W=max(W, 8), cap=int(bb.sum()))


def test_sized_worst_case_content(monkeypatch):
    """Max-amplitude dense blocks: the width bucket must hit the full worst
    case and still be exact (boundary where sizing buys nothing)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    levels = np.full((9, 64), 16383, dtype=np.int32)
    levels[4] = 0                                # empty next to worst-case
    _check_sized(levels)


def _sized_merge_unit_edges(ns):
    u = 1 << DC.MERGE_DEPTH
    for n in ns:
        levels = np.zeros((n, 64), dtype=np.int32)
        levels[0::2, :7] = 9                     # short blocks
        levels[1::2, 0] = -1                     # next to 1-byte-code ones
        _check_sized(levels)


def test_sized_merge_unit_edge(monkeypatch):
    """The n = 2**MERGE_DEPTH + 1 boundary at a narrow width (W=8) in the
    default run; full straddle sweep gated (one interpret trace per n)."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    _sized_merge_unit_edges(((1 << DC.MERGE_DEPTH) + 1,))


@pytest.mark.slow
def test_sized_merge_unit_edges(monkeypatch):
    """Block counts straddling the 2**MERGE_DEPTH merge-unit size at a
    narrow width (W=8) — unit padding and the overlap extension must hold
    at sized shapes too."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    u = 1 << DC.MERGE_DEPTH
    _sized_merge_unit_edges((1, u - 1, u, u + 1, 2 * u + 2))


def _sized_api_setup(monkeypatch):
    from jpeg_tpu import api
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(api, "_use_device_entropy", lambda: True)
    assert api._sized_entropy_enabled()
    return api


def test_api_sized_path_matches_host(monkeypatch):
    """compress_ycbcr through the two-phase sized path == host-entropy
    container bytes."""
    from jpeg_tpu import Configuration, QuantizationMethod, api
    cfg = Configuration(width=64, height=48, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    img = RNG.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    want = api.compress_ycbcr(img, cfg)          # host-entropy path (CPU)
    api = _sized_api_setup(monkeypatch)
    assert api.compress_ycbcr(img, cfg) == want


def test_api_sized_pipelined_matches(monkeypatch):
    """compress_many keeps phase-1 states in flight; results must equal the
    per-image sized path."""
    from jpeg_tpu import Configuration, QuantizationMethod, api
    cfg = Configuration(width=32, height=32, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    imgs = [RNG.integers(0, 256, (32, 32, 3)).astype(np.uint8)
            for _ in range(3)]
    want = [api.compress_ycbcr(im, cfg) for im in imgs]
    api = _sized_api_setup(monkeypatch)
    assert api.compress_many(imgs, cfg) == want


def test_large_L_off_tpu_sized_gate(monkeypatch):
    """Off-TPU, L > 75 must NOT take the sized/tables kernel paths: such
    bands can hold zero-runs needing > 4 chain bytes, which only the (too-
    slow-to-interpret) lv kernel carries.  The gate routes callers to
    encode_stream, whose guard picks the always-correct scatter path; the
    tables path itself refuses (code-review finding, round 2)."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    assert DC.sized_entropy_default(64)
    assert not DC.sized_entropy_default(100)
    lv = np.zeros((4, 100), np.int32)
    lv[1, 99] = 5                     # 99-zero run: 6 chain bytes
    lv[2, 0] = 3
    want = NC.encode_levels(lv)
    buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
    buf, total = np.asarray(buf), int(np.asarray(bb).sum())
    assert buf[:total].tobytes() == want and not buf[total:].any()
    with pytest.raises(ValueError, match="lv kernel"):
        DC.encode_rows(jnp.asarray(lv))


def test_batch_sized_matches_host(monkeypatch):
    """parallel.compress_batch through the sized two-phase path (virtual
    mesh, device entropy forced) == per-image host-entropy containers."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    from jpeg_tpu import Configuration, QuantizationMethod, api, parallel
    assert DC.sized_entropy_default()
    mesh = parallel.make_mesh()
    cfg = Configuration(width=32, height=32, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    imgs = np.stack([RNG.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                     for _ in range(4)])
    want = [api.compress_ycbcr(im, cfg) for im in imgs]
    got = parallel.compress_batch(imgs, cfg, mesh, device_entropy=True)
    assert got == want


def test_api_sized_rejects_unrepresentable(monkeypatch):
    """|level| > 16383 must raise from the stats check before phase 2."""
    from jpeg_tpu import BadRleCodeError, Configuration, QuantizationMethod
    from jpeg_tpu import api
    api = _sized_api_setup(monkeypatch)
    # dct_size 24, no quantization: DC of a bright plane ~200*576 >> 16383
    # (same construction as test_api_edge.py:test_overrange_amplitude_rejected)
    cfg = Configuration(width=48, height=48, block_size=1, dct_size=24,
                        quantization=QuantizationMethod("none"))
    img = np.full((48, 48, 3), 200, dtype=np.uint8)
    with pytest.raises(BadRleCodeError):
        api.compress_ycbcr(img, cfg)


def test_sized_undersized_width_detected(monkeypatch):
    """An undersized row width must be DETECTED in-program (flag set,
    buffer zeroed) and raised by the host check — never silently truncated
    (the wire format has no redundancy, reference rle_byte_stream.py:48-58).
    """
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    levels = np.full((16, 64), 16383, dtype=np.int32)    # 185-byte blocks
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(levels)))
    cap = DC.encode_cap_bucket(int(bb.sum()),
                               16 * DC.worst_case_block_bytes(64))
    buf, _, bad = jax.jit(
        lambda lv: DC.encode_stream_sized(lv, 8, cap))(jnp.asarray(levels))
    assert bool(bad)                             # W=8 holds only 32 bytes
    assert not np.asarray(buf).any()             # poisoned, not plausible
    with pytest.raises(ValueError, match="sized encode overflow"):
        DC.check_sized_ok(bad)


def test_sized_undersized_cap_detected(monkeypatch):
    """A cap shorter than the true stream must set the flag too."""
    from jpeg_tpu.ops import pallas_kernels as PK
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    monkeypatch.setattr(PK, "ENC_TILE", 64)
    levels = np.zeros((40, 64), dtype=np.int32)
    levels[:, :6] = RNG.integers(-100, 100, (40, 6))
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(levels)))
    W = DC.encode_words_bucket(64, int(bb.max()))
    total = int(bb.sum())
    _, _, bad = jax.jit(
        lambda lv: DC.encode_stream_sized(lv, W, total - 8))(
            jnp.asarray(levels))
    assert bool(bad)
    # (the exact-cap-stays-legal dual is test_sized_exact_width_and_cap)
