"""Native C++ entropy codec: equivalence with the NumPy codec + error paths."""
import numpy as np
import pytest

from jpeg_tpu.config import BadRleCodeError, BadStreamError
from jpeg_tpu.entropy import numpy_codec as NC

native = pytest.importorskip("jpeg_tpu.entropy.native_codec")
pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec unavailable (no g++?)")


@pytest.mark.parametrize("seed", range(5))
def test_encode_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n, L = 23, 64
    levels = np.zeros((n, L), dtype=np.int32)
    mask = rng.random((n, L)) < rng.uniform(0.02, 0.6)
    levels[mask] = rng.integers(-16383, 16384, size=int(mask.sum()))
    assert native.encode_levels(levels) == NC.encode_levels(levels)


def test_decode_matches_numpy_and_roundtrips():
    rng = np.random.default_rng(42)
    n, L = 31, 49   # dct_size 7
    levels = np.zeros((n, L), dtype=np.int32)
    mask = rng.random((n, L)) < 0.2
    levels[mask] = rng.integers(-500, 500, size=int(mask.sum()))
    data = native.encode_levels(levels)
    assert native.decode_levels(data, n, L).tolist() == levels.tolist()
    assert NC.decode_levels(data, n, L).tolist() == levels.tolist()


def test_extremes_and_empty():
    L = 64
    zeros = np.zeros((4, L), dtype=np.int32)
    assert native.encode_levels(zeros) == bytes(4)
    assert native.decode_levels(bytes(4), 4, L).tolist() == zeros.tolist()
    dense = np.full((2, L), 16383, dtype=np.int32)
    data = native.encode_levels(dense)
    assert data == NC.encode_levels(dense)
    assert native.decode_levels(data, 2, L).tolist() == dense.tolist()
    tail = np.zeros((1, 256), dtype=np.int32)   # long runs -> chains
    tail[0, 255] = -1
    data = native.encode_levels(tail)
    assert data == NC.encode_levels(tail)
    assert native.decode_levels(data, 1, 256).tolist() == tail.tolist()


def test_amplitude_overflow_raises():
    bad = np.array([[20000] + [0] * 63], dtype=np.int32)
    with pytest.raises(BadRleCodeError):
        native.encode_levels(bad)


def test_truncation_and_garbage_raise():
    levels = np.array([[5, 3, 1, 0] * 4], dtype=np.int32)
    data = native.encode_levels(levels)
    with pytest.raises(BadStreamError):
        native.decode_levels(data[:-1], 1, 16)
    with pytest.raises(BadStreamError):
        native.decode_levels(data + b"\x00", 1, 16)
