"""Differential fuzzing: all entropy backends agree; random configs round-trip.

Seeded (reproducible) but broad: random sparse levels through the NumPy,
C++ and device codecs must produce identical bytes and identical decodes;
random geometry/quantizer configs must round-trip through the full codec.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jpeg_tpu import Configuration, QuantizationMethod, compress_band, decompress_band
from jpeg_tpu.entropy import device_codec as DC
from jpeg_tpu.entropy import numpy_codec as NC
from jpeg_tpu.entropy import native_codec

RNG = np.random.default_rng(31337)


def _random_levels(rng):
    n = int(rng.integers(1, 40))
    L = int(rng.choice([4, 16, 64, 100]))
    levels = np.zeros((n, L), dtype=np.int32)
    density = rng.choice([0.0, 0.02, 0.1, 0.5, 0.95])
    mask = rng.random(levels.shape) < density
    mag = int(rng.choice([1, 10, 1000, 16383]))
    levels[mask] = rng.integers(-mag, mag + 1, int(mask.sum()))
    return levels


@pytest.mark.parametrize("trial", range(25))
def test_entropy_backends_agree(trial):
    rng = np.random.default_rng(1000 + trial)
    levels = _random_levels(rng)
    n, L = levels.shape

    np_bytes = NC.encode_levels(levels)
    stream, blk_bytes = jax.jit(DC.encode_stream)(jnp.asarray(levels))
    dev_bytes = np.asarray(stream)[:int(np.asarray(blk_bytes).sum())].tobytes()
    assert dev_bytes == np_bytes
    if native_codec.available():
        assert native_codec.encode_levels(levels) == np_bytes
        np.testing.assert_array_equal(
            native_codec.decode_levels(np_bytes, n, L), levels)
        starts = native_codec.scan_offsets(np_bytes, n, L)
        got = np.asarray(jax.jit(DC.decode_stream, static_argnums=2)(
            jnp.asarray(np.frombuffer(np_bytes, np.uint8)),
            jnp.asarray(starts), L))
        np.testing.assert_array_equal(got, levels)
    np.testing.assert_array_equal(NC.decode_levels(np_bytes, n, L), levels)


@pytest.mark.parametrize("trial", range(12))
def test_random_config_roundtrip(trial):
    rng = np.random.default_rng(2000 + trial)
    w = int(rng.integers(1, 60))
    h = int(rng.integers(1, 60))
    bs = int(rng.integers(1, 6))
    d = int(rng.choice([1, 2, 3, 4, 8]))
    quant = rng.choice(["none", "discard", "divide", "qtable"])
    if quant == "qtable" and d != 8:
        d = 8
    kwargs = {}
    if quant == "discard":
        kwargs["keep"] = int(rng.integers(1, d + 1))
    elif quant == "divide":
        kwargs["divisor"] = int(rng.choice([2, 40, 129, 1000]))
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                        quantization=QuantizationMethod(quant, **kwargs))
    band = rng.integers(0, 256, (h, w)).astype(np.int64)
    out = decompress_band(compress_band(band, cfg), cfg)
    assert out.shape == (h, w)
    assert out.min() >= 0 and out.max() <= 255
    if quant in ("none",):
        # Rounding quantizer at block_size 1 is near-lossless.
        if bs == 1:
            assert np.abs(out - band).max() <= 2


def test_corrupt_streams_raise_not_crash():
    from jpeg_tpu.config import BadRleCodeError, BadStreamError
    cfg = Configuration(width=16, height=16, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    band = RNG.integers(0, 256, (16, 16)).astype(np.int64)
    good = compress_band(band, cfg)
    rng = np.random.default_rng(5)
    for _ in range(30):
        bad = bytearray(good)
        op = rng.integers(0, 3)
        if op == 0 and len(bad) > 1:
            del bad[rng.integers(0, len(bad))]
        elif op == 1:
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        else:
            bad.append(int(rng.integers(0, 256)))
        try:
            out = decompress_band(bytes(bad), cfg)
            assert out.shape == (16, 16)     # harmless corruption
        except (BadRleCodeError, BadStreamError):
            pass                             # detected corruption
