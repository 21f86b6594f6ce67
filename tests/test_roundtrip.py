"""Integration round-trips (mirrors + extends reference integration_tests.py)."""
import numpy as np
import pytest

from jpeg_tpu import (Configuration, Jpeg, QuantizationMethod, compress_band,
                      compress_ycbcr, decompress_band, decompress_to_ycbcr,
                      psnr)


def test_compress_and_decompress_on_array():
    original = np.arange(128).reshape(8, 16)
    config = Configuration(width=16, height=8, block_size=3)
    restored = decompress_band(compress_band(original, config), config)
    assert np.allclose(original, restored, rtol=1)


def test_preserves_allowed_range():
    original = np.array([[220, 255, 123, 205],
                         [255, 255, 112, 10],
                         [15, 51, 83, 221],
                         [239, 73, 62, 22]])
    config = Configuration(width=4, height=4, block_size=1, dct_size=2,
                           quantization=QuantizationMethod("divide",
                                                           divisor=129))
    restored = decompress_band(compress_band(original, config), config)
    assert np.all(restored < 256)
    assert np.all(restored > -1)


def test_fourier_transform_option():
    original = np.arange(128).reshape(8, 16)
    config = Configuration(width=16, height=8, block_size=3, transform="DFT")
    restored = decompress_band(compress_band(original, config), config)
    assert np.allclose(original, restored, rtol=1)


def test_without_subsampling_near_lossless():
    original = np.arange(6).reshape(2, 3)
    config = Configuration(width=3, height=2, block_size=1)
    restored = decompress_band(compress_band(original, config), config)
    assert np.allclose(original, restored, rtol=1e-6)


def test_with_1pixel_blocks():
    original = np.arange(64).reshape(8, 8)
    config = Configuration(width=8, height=8, block_size=1, dct_size=1)
    restored = decompress_band(compress_band(original, config), config)
    assert np.allclose(original, restored, rtol=1e-6)


def test_dct24_divide1000_high_compression():
    rng = np.random.default_rng(0)
    h, w = 50, 70
    smooth = np.clip(
        128 + 60 * np.sin(np.arange(h)[:, None] / 9)
        + 50 * np.cos(np.arange(w)[None, :] / 11)
        + rng.normal(0, 2, (h, w)), 0, 255).astype(np.int64)
    config = Configuration(width=w, height=h, block_size=5, dct_size=24,
                           quantization=QuantizationMethod("divide",
                                                           divisor=1000))
    data = compress_band(smooth, config)
    restored = decompress_band(data, config)
    assert len(data) < h * w // 10          # "huge compression rate"
    assert psnr(smooth, restored) > 20


def test_full_image_container_roundtrip():
    rng = np.random.default_rng(7)
    h, w = 21, 33
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    config = Configuration(width=w, height=h, block_size=1, dct_size=8,
                           quantization=QuantizationMethod("qtable"))
    blob = compress_ycbcr(img, config)
    rec = decompress_to_ycbcr(blob)
    assert rec.shape == img.shape
    assert rec.dtype == np.uint8
    assert psnr(img, rec) > 25


def test_jpeg_class_with_pil():
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    rng = np.random.default_rng(11)
    rgb = Image.fromarray(
        rng.integers(0, 256, size=(24, 31, 3)).astype(np.uint8), mode="RGB")
    config = Configuration(width=31, height=24, block_size=2, dct_size=8,
                           quantization=QuantizationMethod("qtable"))
    blob = Jpeg(config).compress(rgb)
    rec = Jpeg.decompress(blob)
    assert rec.mode == "YCbCr"
    assert rec.size == rgb.size


def test_deterministic_bitstream():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(40, 56))
    config = Configuration(width=56, height=40, block_size=2, dct_size=8,
                           quantization=QuantizationMethod("qtable"))
    assert compress_band(a, config) == compress_band(a, config)


def test_fast_mode_f32_quality_matches_parity_mode():
    """The f32 fast path may differ from f64 only at half-integer rounding
    edges; reconstructions must be visually identical (tiny, sparse diffs)."""
    from jpeg_tpu import compress_ycbcr, decompress_to_ycbcr, psnr
    y, x = np.mgrid[0:64, 0:96]
    img = np.clip(np.stack([128 + 70 * np.sin(x / 9.0) * np.cos(y / 7.0),
                            128 + 50 * np.cos(x / 13.0),
                            128 + 50 * np.sin(y / 11.0)], -1),
                  0, 255).astype(np.uint8)
    cfg = Configuration(width=96, height=64, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    out64 = decompress_to_ycbcr(compress_ycbcr(img, cfg, dtype=np.float64),
                                dtype=np.float64)
    out32 = decompress_to_ycbcr(compress_ycbcr(img, cfg, dtype=np.float32),
                                dtype=np.float32)
    diff = np.abs(out64.astype(int) - out32.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.005            # <0.5% of pixels
    assert psnr(out64, out32) > 45
