"""Container format tests (mirrors reference file_format_tests.py)."""
import struct

import pytest

from jpeg_tpu import (CompressedData, Configuration, QuantizationMethod,
                      create_header, generate_data, get_header, read_data)


def test_header_roundtrip_qtable_dft():
    cfg = Configuration(width=340, height=250, block_size=3, dct_size=8,
                        transform="DFT",
                        quantization=QuantizationMethod("qtable"))
    out = get_header(create_header(cfg))
    assert (out.width, out.height) == (340, 250)
    assert (out.block_size, out.dct_size) == (3, 8)
    assert out.transform == "DFT"
    assert out.quantization == QuantizationMethod("qtable")


def test_header_roundtrip_divide_dct():
    cfg = Configuration(width=12, height=1025, block_size=2, dct_size=4,
                        transform="DCT",
                        quantization=QuantizationMethod("divide", divisor=129))
    out = get_header(create_header(cfg))
    assert out.quantization.name == "divide"
    assert out.quantization.divisor == 129
    assert out.dct_size == 4


def test_header_golden_bytes():
    cfg = Configuration(width=16, height=8, block_size=2, dct_size=8,
                        transform="DCT")
    quant_json = '{"quantization_scheme_name": "none"}'
    expected = (struct.pack("<H", 2 + 13 + len(quant_json))
                + struct.pack("<H", 16) + struct.pack("<H", 8)
                + struct.pack("<H", 2) + struct.pack("<H", 8)
                + b"DCT" + struct.pack("<H", len(quant_json))
                + quant_json.encode())
    assert create_header(cfg) == expected


def test_container_roundtrip_with_band_bytes():
    cfg = Configuration(width=5, height=4, block_size=1, dct_size=2)
    data = CompressedData(y=b"\x01\x02\x03", cb=b"", cr=b"\xff" * 7)
    blob = generate_data(cfg, data)
    cfg2, data2 = read_data(blob)
    assert (cfg2.width, cfg2.height) == (5, 4)
    assert data2.y == b"\x01\x02\x03"
    assert data2.cb == b""
    assert data2.cr == b"\xff" * 7


def test_dims_exceeding_u16_rejected():
    from jpeg_tpu.config import BadArrayShapeError
    with pytest.raises(BadArrayShapeError):
        Configuration(width=70000, height=8)


def test_truncated_container_raises():
    import struct
    from jpeg_tpu import container
    from jpeg_tpu.config import Configuration, QuantizationMethod
    cfg = Configuration(width=8, height=8, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    blob = container.generate_data(
        cfg, container.CompressedData(b"\x00" * 5, b"\x00" * 3, b"\x00" * 2))
    # Truncations inside the header or band-length fields must raise
    # struct.error (not silently misparse).
    for cut in (1, 3, 10, 14):
        with pytest.raises(struct.error):
            container.read_data(blob[:cut])


def test_container_with_short_band_payload():
    from jpeg_tpu import container
    from jpeg_tpu.config import Configuration, QuantizationMethod
    cfg = Configuration(width=8, height=8, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    blob = container.generate_data(
        cfg, container.CompressedData(b"\x01\x02", b"\x03", b"\xaa\xbb"))
    # Band payload shorter than its declared length: reader returns what is
    # present; the entropy decoder downstream rejects the truncated stream.
    got_cfg, data = container.read_data(blob[:-1])
    assert data.cr == b"\xaa"
