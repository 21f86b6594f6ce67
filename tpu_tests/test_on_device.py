"""On-device tests: the PRODUCTION TPU path, uninstrumented.

The main suite (tests/) pins jax to the CPU backend with x64 for parity
oracles, so compiled Mosaic kernels, the f32 defaults and the real
device-entropy branches never execute there.  This suite runs them on the
actual backend:

    python -m pytest tpu_tests/ -q        # on a TPU machine

Skipped wholesale when no TPU backend is available.
"""
import numpy as np
import pytest
import jax

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="requires a TPU backend")


@pytest.fixture(scope="module")
def img():
    y, x = np.mgrid[0:96, 0:128].astype(np.float64)
    plane = np.clip(128 + 70 * np.sin(x / 11.0) * np.cos(y / 13.0), 0, 255)
    return np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8)


def _cfg(**kw):
    from jpeg_tpu import Configuration, QuantizationMethod
    kw.setdefault("width", 128)
    kw.setdefault("height", 96)
    kw.setdefault("block_size", 2)
    kw.setdefault("dct_size", 8)
    kw.setdefault("quantization", QuantizationMethod("qtable"))
    return Configuration(**kw)


def _check_tie_contract(cfg, band):
    """Both f32 paths (compiled Mosaic and XLA) vs the f64 oracle under the
    +-1-at-provable-ties contract (jpeg_tpu/utils/parity.py)."""
    from jpeg_tpu.ops import band as band_ops
    from jpeg_tpu.utils import parity as PAR
    key = band_ops.config_key(cfg)
    lv_pal = np.asarray(jax.jit(band_ops.make_encode(key, "float32", True))(band))
    lv_xla = np.asarray(jax.jit(band_ops.make_encode(key, "float32", False))(band))
    lv_ref, et = PAR.encode_reference_and_ties(cfg, band)
    PAR.assert_tie_equal(lv_xla, lv_ref, et, "encode xla vs f64")
    PAR.assert_tie_equal(lv_pal, lv_ref, et, "encode mosaic vs f64")
    px_pal = np.asarray(jax.jit(band_ops.make_decode(key, "float32", True))(lv_xla))
    px_xla = np.asarray(jax.jit(band_ops.make_decode(key, "float32", False))(lv_xla))
    px_ref, dt = PAR.decode_reference_and_ties(cfg, lv_xla)
    PAR.assert_tie_equal(px_xla, px_ref, dt, "decode xla vs f64")
    PAR.assert_tie_equal(px_pal, px_ref, dt, "decode mosaic vs f64")


def test_pallas_compiled_matches_xla(img):
    _check_tie_contract(_cfg(), img[:, :, 0].astype(np.int32))


@pytest.mark.parametrize("d,transform,bs", [
    (24, "DCT", 2),   # BASELINE config 3 family; worst-case panel width
    (8, "DFT", 2),    # dyadic-rational operator -> tie-dense
    (8, "DCT", 3),    # non-pow2 subsample divisor
])
def test_ragged_combined_decode_on_chip(d, transform, bs):
    # Real-Mosaic coverage for the any-geometry combined pr-major decode
    # (ops/band.py combined_p): ragged at both the subsample and DCT-pad
    # stages, checked against the f64 oracle under the tie contract.
    from jpeg_tpu import Configuration, QuantizationMethod
    rng = np.random.default_rng(1000 * d + bs)
    w, h = d * 2 * 5 + 3, d * 2 * 3 + 1
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                        transform=transform,
                        quantization=QuantizationMethod("divide", divisor=40))
    band = rng.integers(0, 256, (h, w)).astype(np.int32)
    _check_tie_contract(cfg, band)


def test_roundtrip_quality_and_entropy_modes(img, monkeypatch):
    from jpeg_tpu import compress_ycbcr, decompress_to_ycbcr, psnr
    cfg = _cfg()
    blob_dev = compress_ycbcr(img, cfg)                 # device entropy
    monkeypatch.setenv("JPEG_TPU_HOST_ENTROPY", "1")
    blob_host = compress_ycbcr(img, cfg)                # host entropy
    monkeypatch.delenv("JPEG_TPU_HOST_ENTROPY")
    assert blob_dev == blob_host

    out_dev = decompress_to_ycbcr(blob_dev)             # device bit parsing
    monkeypatch.setenv("JPEG_TPU_DEVICE_DECODE", "0")
    out_host = decompress_to_ycbcr(blob_dev)
    monkeypatch.delenv("JPEG_TPU_DEVICE_DECODE")
    np.testing.assert_array_equal(out_dev, out_host)
    assert psnr(img, out_dev) > 30


def test_fast_mode_matches_parity_decode(img, tmp_path):
    """f32 TPU decode of a stream equals the f64 CPU parity decode exactly
    (the MXU HIGHEST-precision guarantee).  Parity mode needs x64, which is
    process-global, so the oracle decode runs in a CPU subprocess."""
    import hashlib
    import subprocess
    import sys
    from jpeg_tpu import compress_ycbcr, decompress_to_ycbcr
    cfg = _cfg()
    blob = compress_ycbcr(img, cfg)
    out_tpu = decompress_to_ycbcr(blob)
    p = tmp_path / "blob.jc"
    p.write_bytes(blob)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "import hashlib, numpy as np; from jpeg_tpu import decompress_to_ycbcr;"
        f"out = decompress_to_ycbcr(open({str(p)!r},'rb').read());"
        "print(hashlib.sha256(out.tobytes()).hexdigest())")
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    assert hashlib.sha256(out_tpu.tobytes()).hexdigest() == \
        res.stdout.strip().splitlines()[-1]


def test_float64_without_x64_raises_clearly(img):
    from jpeg_tpu import compress_ycbcr
    with pytest.raises(ValueError, match="x64"):
        compress_ycbcr(img, _cfg(), dtype=np.float64)


def test_exotic_configs_roundtrip(img):
    from jpeg_tpu import (Configuration, QuantizationMethod, compress_ycbcr,
                          decompress_to_ycbcr, psnr)
    for cfg in [
        _cfg(transform="DFT", quantization=QuantizationMethod("none")),
        _cfg(dct_size=24, block_size=4,
             quantization=QuantizationMethod("divide", divisor=1000)),
        _cfg(dct_size=4, block_size=1,
             quantization=QuantizationMethod("discard", keep=2)),
    ]:
        out = decompress_to_ycbcr(compress_ycbcr(img, cfg))
        assert out.shape == img.shape
        assert psnr(img, out) > 15


def test_dft_pallas_matches_xla_on_chip(img):
    # Compiled Mosaic DFT kernel (Re(F kron F) operator) vs XLA f32 matmul
    # and the f64 oracle, under the tie contract.
    from jpeg_tpu import QuantizationMethod
    cfg = _cfg(transform="DFT", quantization=QuantizationMethod("none"))
    _check_tie_contract(cfg, img[:, :, 0].astype(np.int32))


def test_foreign_decode_one_dispatch_on_chip(img, monkeypatch):
    # Host-free scan+parse+IDCT in one program (api._decode3_foreign_fn)
    # must reproduce the default host-scan path bit-for-bit on chip.
    from jpeg_tpu import compress_ycbcr, decompress_to_ycbcr
    cfg = _cfg()
    blob = compress_ycbcr(img, cfg)
    base = decompress_to_ycbcr(blob)
    monkeypatch.setenv("JPEG_TPU_SCAN", "device")
    from jpeg_tpu.entropy import device_scan as DS
    DS._rung_cache.pop(cfg.dct_size ** 2, None)
    np.testing.assert_array_equal(decompress_to_ycbcr(blob), base)


def test_device_decode_without_native_codec(img, monkeypatch):
    """Device bit parsing stays available with no C++ codec: the pure-Python
    scanner backs entropy.scan_offsets (VERDICT r1 item 5)."""
    import jpeg_tpu.entropy as entropy
    from jpeg_tpu import compress_ycbcr, decompress_to_ycbcr
    cfg = _cfg()
    blob = compress_ycbcr(img, cfg)
    want = decompress_to_ycbcr(blob)
    monkeypatch.setattr(entropy, "_native", None)
    monkeypatch.setattr(entropy, "_native_checked", True)
    got = decompress_to_ycbcr(blob)       # python scan + device bit parse
    np.testing.assert_array_equal(got, want)


def test_pipelined_many_matches_serial_on_chip(img):
    from jpeg_tpu import api
    cfg = _cfg()
    blobs = api.compress_many([img, img[:, :, ::-1].copy()], cfg)
    assert blobs[0] == api.compress_ycbcr(img, cfg)
    assert blobs[1] == api.compress_ycbcr(img[:, :, ::-1].copy(), cfg)
    recon = api.decompress_many(blobs)
    np.testing.assert_array_equal(recon[0], api.decompress_to_ycbcr(blobs[0]))


def test_decompress_plane_on_chip(img):
    from jpeg_tpu import api, parallel
    cfg = _cfg()
    mesh = parallel.make_mesh(1)
    plane = img[:, :, 0].astype(np.int32)
    stream = api.compress_band(plane, cfg)
    got = parallel.decompress_plane(stream, cfg, mesh, device_entropy=True)
    np.testing.assert_array_equal(got, np.asarray(api.decompress_band(stream, cfg)))


def test_long_run_encode_on_chip():
    """Compiled lv kernel with zero-runs past the 55-bit group limit
    (L = 144: up to 9 chain bytes, split across extra appends) — byte-
    identical to the host codec both directions.  The interpret suite
    covers this logic slowly; this runs the real Mosaic lowering."""
    import jax.numpy as jnp
    from jpeg_tpu import entropy
    from jpeg_tpu.entropy import device_codec as DC
    rng = np.random.default_rng(5)
    L = 144
    lv = np.zeros((96, L), np.int32)
    mask = rng.random(lv.shape) < 0.04          # sparse: long runs abound
    lv[mask] = rng.integers(-16383, 16384, int(mask.sum()))
    lv[1] = 0
    lv[1, L - 1] = 5                            # maximal 143-zero run
    lv[2] = 0
    lv[2, 0] = -3                               # trailing zeros dropped
    lv[3] = 0
    lv[3, 75] = 7
    lv[3, L - 1] = -9                           # two long runs, one block
    want = entropy.encode_levels(lv)
    buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
    buf, total = np.asarray(buf), int(np.asarray(bb).sum())
    assert buf[:total].tobytes() == want
    assert not buf[total:].any()
    # device bit-parse of the same stream returns the exact levels
    starts = entropy.scan_offsets(want, lv.shape[0], L)
    from jpeg_tpu.utils.device import pow2_cap
    pad = pow2_cap(total)
    arr = np.zeros(pad, np.uint8)
    arr[:total] = np.frombuffer(want, np.uint8)
    got = np.asarray(jax.jit(
        lambda s, t: DC.decode_stream(s, t, L, 0))(arr, starts))
    np.testing.assert_array_equal(got, lv)


def test_sized_encode_on_chip(img):
    """Two-phase content-sized encode (production default) == host-entropy
    container bytes, through the public API on the real chip."""
    import os
    from jpeg_tpu import api
    cfg = _cfg()
    blob = api.compress_ycbcr(img, cfg)
    env = dict(os.environ)
    os.environ["JPEG_TPU_HOST_ENTROPY"] = "1"
    try:
        want = api.compress_ycbcr(img, cfg)
    finally:
        os.environ.clear()
        os.environ.update(env)
    assert blob == want


def test_merge_kernel_matches_xla_on_chip():
    """Compiled Mosaic merge kernel == the XLA pairwise merge on real
    hardware (the interpret suite validates the logic; this validates the
    Mosaic lowering: 4-D block specs, lane/sublane concat ladders)."""
    import jax.numpy as jnp
    from jpeg_tpu.entropy import device_codec as DC
    rng = np.random.default_rng(7)
    n, W, m = 2 << DC.MERGE_DEPTH, 16, DC.MERGE_DEPTH
    lens = rng.integers(0, 4 * W + 1, n).astype(np.int32)
    b = np.zeros((n, 4 * W), np.uint32)
    mask = np.arange(4 * W)[None, :] < lens[:, None]
    b[mask] = rng.integers(1, 256, int(mask.sum()))
    sh = (24 - 8 * (np.arange(4 * W) % 4)).astype(np.uint32)
    rows = np.bitwise_or.reduce(
        (b << sh).reshape(n, W, 4), axis=2).astype(np.int32)
    want_u, want_l = jax.jit(
        lambda r, l: DC._merge_rows(r, l, m))(rows, jnp.asarray(lens))
    got_u, got_l = jax.jit(
        lambda r, l: DC._merge_rows_device(r, l, m))(rows, jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(want_l), np.asarray(got_l))
    np.testing.assert_array_equal(np.asarray(want_u), np.asarray(got_u))


def test_device_scan_on_chip():
    """Compiled device boundary scan == C++ scan, and the hybrid dispatch
    decodes end-to-end under the flag (entropy/device_scan.py)."""
    from jpeg_tpu import entropy
    from jpeg_tpu.entropy import device_scan as DS
    rng = np.random.default_rng(11)
    nb, L = 700, 64
    lv = np.zeros((nb, L), np.int32)
    m = rng.random(lv.shape) < 0.15
    lv[m] = rng.integers(-2000, 2000, int(m.sum()))
    data = entropy.encode_levels(lv)
    starts, ok = DS.scan_offsets_device(data, nb, L)
    assert ok
    np.testing.assert_array_equal(starts, entropy.scan_offsets(data, nb, L))
    _, ok_bad = DS.scan_offsets_device(data[:-1], nb, L)
    assert not ok_bad


def test_words_interchange_on_chip():
    """Compiled device round trip over the BE-word interchange: sized
    encode (emit="words") -> decode_stream with no u8 relayout on either
    side, starts from the encoder's own byte counts."""
    import jax.numpy as jnp
    from jpeg_tpu import entropy
    from jpeg_tpu.entropy import device_codec as DC
    rng = np.random.default_rng(5)
    nb, L = 900, 64
    lv = np.zeros((nb, L), np.int32)
    m = rng.random(lv.shape) < 0.2
    lv[m] = rng.integers(-2000, 2000, int(m.sum()))
    bb = np.asarray(jax.jit(DC.block_bytes_of)(jnp.asarray(lv)))
    W = DC.encode_words_bucket(L, int(bb.max()))
    cap = DC.encode_cap_bucket(int(bb.sum()), nb * DC.worst_case_block_bytes(L))

    @jax.jit
    def roundtrip(levels):
        words, b, bad = DC.encode_stream_sized(levels, W, cap, emit="words")
        st = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(b)[:-1].astype(jnp.int32)])
        return words, b, bad, DC.decode_stream(
            words, st, L, total_len=b.sum().astype(jnp.int32))

    words, b, bad, got = roundtrip(jnp.asarray(lv))
    DC.check_sized_ok(bad)
    total = int(np.asarray(b).sum())
    assert np.asarray(words).astype(">u4").tobytes()[:total] == \
        entropy.encode_levels(lv)
    np.testing.assert_array_equal(np.asarray(got), lv)
