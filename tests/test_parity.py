"""Bit-exact parity against the live reference implementation.

The reference at /root/reference is imported (with compatibility shims, see
reference_oracle.py) and used as an oracle: for every config our compressed
bytes must equal its bytes exactly, and both decoders must produce identical
integer planes from the same stream.
"""
import warnings
import zlib

import numpy as np
import pytest

from tests import reference_oracle

from jpeg_tpu import Configuration, QuantizationMethod
from jpeg_tpu import compress_band, decompress_band, compress_ycbcr

pytestmark = pytest.mark.skipif(not reference_oracle.available(),
                                reason="reference repo not present")

# (w, h, block_size, dct_size, transform, (quant_name, params) | None)
CONFIGS = [
    # BASELINE.json config 1: defaults, DCT, dct_size 8, rounding quantizer
    (16, 8, 2, 8, "DCT", None),
    # BASELINE.json config 2: subsampling block 5, DCT 8 (rounding + qtable)
    (37, 23, 5, 8, "DCT", None),
    (37, 23, 5, 8, "DCT", ("qtable", {})),
    # BASELINE.json config 3: high compression divide/1000 at dct_size 24
    (50, 30, 5, 24, "DCT", ("divide", {"divisor": 1000})),
    # BASELINE.json config 4: DFT transform mode
    (16, 8, 3, 8, "DFT", None),
    (24, 16, 2, 8, "DFT", ("divide", {"divisor": 40})),
    # quantizer / geometry corners
    (16, 8, 1, 4, "DCT", ("discard", {"keep": 2})),
    (17, 13, 2, 8, "DCT", ("qtable", {})),
    (20, 10, 5, 8, "DCT", ("divide", {"divisor": 40})),
    (12, 12, 1, 8, "DCT", None),
    (3, 2, 1, 2, "DCT", None),
    (1, 1, 1, 1, "DCT", None),
    (9, 7, 4, 3, "DCT", ("divide", {"divisor": 5})),
    # regression: non-power-of-2 subsample area (bs=5 -> /25) where XLA's
    # division->reciprocal rewrite under jit flipped a half-integer round
    (10, 48, 5, 2, "DCT", ("discard", {"keep": 2})),
    (17, 17, 6, 3, "DFT", ("divide", {"divisor": 2})),
    (26, 49, 3, 12, "DCT", ("divide", {"divisor": 2})),
]


def _pair(w, h, bs, d, tr, q):
    ref = reference_oracle.load()
    qr = ref.pipeline.QuantizationMethod(q[0], **q[1]) if q else None
    qo = QuantizationMethod(q[0], **q[1]) if q else None
    rcfg = ref.pipeline.Configuration(width=w, height=h, block_size=bs,
                                      dct_size=d, transform=tr,
                                      quantization=qr)
    ocfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                         transform=tr, quantization=qo)
    return ref, rcfg, ocfg


@pytest.mark.parametrize("w,h,bs,d,tr,q", CONFIGS)
def test_band_encode_and_decode_bit_exact(w, h, bs, d, tr, q):
    ref, rcfg, ocfg = _pair(w, h, bs, d, tr, q)
    # NB: deterministic seed (Python's hash() is salted per process for str).
    rng = np.random.default_rng(
        zlib.crc32(repr((w, h, bs, d, tr)).encode()))
    a = rng.integers(0, 256, size=(h, w)).astype(np.int64)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_bytes = ref.pipeline.compress_band(a.copy(), rcfg)
        ours = compress_band(a, ocfg)
        assert ours == ref_bytes

        ref_plane = np.asarray(
            ref.pipeline.decompress_band(ref_bytes, rcfg)).reshape(h, w)
        our_plane = np.asarray(decompress_band(ref_bytes, ocfg))
    assert np.array_equal(our_plane, ref_plane)


def test_smooth_image_parity():
    """Natural-image-like content (smooth gradients), qtable default path."""
    ref, rcfg, ocfg = _pair(48, 32, 4, 8, "DCT", ("qtable", {}))
    y, x = np.mgrid[0:32, 0:48]
    a = np.clip(128 + 80 * np.sin(x / 7.0) * np.cos(y / 5.0), 0,
                255).astype(np.int64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert compress_band(a, ocfg) == ref.pipeline.compress_band(a.copy(),
                                                                    rcfg)


def test_full_container_parity():
    ref = reference_oracle.load()
    rng = np.random.default_rng(99)
    h, w = 19, 26
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)

    q = ref.pipeline.QuantizationMethod("qtable")
    rcfg = ref.pipeline.Configuration(width=w, height=h, block_size=4,
                                      dct_size=8, quantization=q)
    ocfg = Configuration(width=w, height=h, block_size=4, dct_size=8,
                         quantization=QuantizationMethod("qtable"))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_bands = [ref.pipeline.compress_band(
            img[:, :, i].astype(np.int64), rcfg) for i in range(3)]
        ref_blob = ref.file_format.generate_data(
            rcfg, ref.pipeline.CompressedData(*ref_bands))
        our_blob = compress_ycbcr(img, ocfg)
    assert our_blob == ref_blob

    # decode the shared blob with both decoders
    from jpeg_tpu import decompress_to_ycbcr
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_img = np.asarray(ref.pipeline.Jpeg.decompress(ref_blob))
        our_img = decompress_to_ycbcr(our_blob)
    assert np.array_equal(our_img, ref_img)


@pytest.mark.parametrize("tr", ["DCT", "DFT"])
def test_rounding_edge_stress(tr):
    """Many random trials on the ULP-sensitive config: rounding quantizer on
    raw coefficients, where d=8's k=4 row makes exact half-integer
    coefficients.  The parity-exact transform path must match the reference
    bitwise on every draw (the plain matmul path fails ~3% of blocks)."""
    ref, rcfg, ocfg = _pair(16, 16, 1, 8, tr, None)
    rng = np.random.default_rng(2026)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(25):
            a = rng.integers(0, 256, size=(16, 16)).astype(np.int64)
            ref_bytes = ref.pipeline.compress_band(a.copy(), rcfg)
            assert compress_band(a, ocfg) == ref_bytes
            ref_plane = np.asarray(
                ref.pipeline.decompress_band(ref_bytes, rcfg)).reshape(16, 16)
            assert np.array_equal(
                np.asarray(decompress_band(ref_bytes, ocfg)), ref_plane)


def test_rle_tuple_parity():
    """Step-level: our tuple view matches the reference RLE step exactly."""
    ref = reference_oracle.load()
    from jpeg_tpu.entropy import tuples as TU
    rng = np.random.default_rng(4)
    arr = np.zeros((3, 2, 16))
    mask = rng.random(arr.shape) < 0.3
    arr[mask] = rng.integers(-200, 200, size=int(mask.sum()))
    step = ref.pipeline.run_length_encoding.RunLengthEncoding(config=None)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = step.execute(arr)
    got = TU.encode_levels_to_tuples(arr.reshape(6, 16))
    assert got == expected


@pytest.mark.parametrize("trial", range(18))
def test_fuzz_config_parity(trial):
    """Randomized configs x random images: byte parity both directions."""
    rng = np.random.default_rng(7000 + trial)
    w = int(rng.integers(1, 40))
    h = int(rng.integers(1, 40))
    bs = int(rng.integers(1, 6))
    d = int(rng.choice([1, 2, 3, 4, 5, 8, 12]))
    tr = str(rng.choice(["DCT", "DCT", "DCT", "DFT"]))
    qname = str(rng.choice(["none", "discard", "divide", "qtable"]))
    if qname == "qtable":
        d = 8
    q = None
    if qname == "discard":
        q = ("discard", {"keep": int(rng.integers(1, d + 1))})
    elif qname == "divide":
        q = ("divide", {"divisor": int(rng.choice([2, 13, 40, 129, 1000]))})
    elif qname == "qtable":
        q = ("qtable", {})
    ref, rcfg, ocfg = _pair(w, h, bs, d, tr, q)
    a = rng.integers(0, 256, size=(h, w)).astype(np.int64)
    import util as ref_util  # reference module (sys.path added by oracle)
    from jpeg_tpu.config import BadRleCodeError
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            ref_bytes = ref.pipeline.compress_band(a.copy(), rcfg)
        except ref_util.BadRleCodeError:
            # Unrepresentable amplitude (>16383): we must reject it too.
            with pytest.raises(BadRleCodeError):
                compress_band(a, ocfg)
            return
        assert compress_band(a, ocfg) == ref_bytes, (w, h, bs, d, tr, q)
        ref_plane = np.asarray(
            ref.pipeline.decompress_band(ref_bytes, rcfg)).reshape(h, w)
        assert np.array_equal(np.asarray(decompress_band(ref_bytes, ocfg)),
                              ref_plane), (w, h, bs, d, tr, q)
