"""Golden compressed-file artifacts: wire-format stability regression tests.

The blobs in tests/golden/ were produced in parity mode (and cross-checked
bit-exact against the reference via tests/test_parity.py at generation
time).  These tests guard the wire format without importing the reference:
encoding the same synthetic images must reproduce the blobs byte-for-byte,
and decoding the stored blobs must reproduce the recorded plane hashes.
"""
import hashlib
import json
import os

import numpy as np
import pytest

from jpeg_tpu import (Configuration, QuantizationMethod, compress_ycbcr,
                      decompress_to_ycbcr)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

with open(os.path.join(GOLDEN, "manifest.json")) as f:
    MANIFEST = json.load(f)


def _synth(h, w):
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    rng = np.random.default_rng(42)
    img = np.stack([128 + 70 * np.sin(x / 13) * np.cos(y / 11),
                    128 + 50 * np.cos(x / 7),
                    np.clip(8 * rng.standard_normal((h, w)) + 128, 0, 255)],
                   -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _config(entry):
    kw = dict(entry["config"])
    q = kw.get("quantization")
    if isinstance(q, dict):
        kw["quantization"] = QuantizationMethod(q["name"], **q["params"])
    return Configuration(**kw)


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_golden_encode_reproduces_blob(name):
    entry = MANIFEST[name]
    cfg = _config(entry)
    blob = compress_ycbcr(_synth(cfg.height, cfg.width), cfg)
    assert hashlib.sha256(blob).hexdigest() == entry["blob_sha256"]
    with open(os.path.join(GOLDEN, f"{name}.jc"), "rb") as f:
        assert blob == f.read()


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_golden_decode_reproduces_planes(name):
    entry = MANIFEST[name]
    with open(os.path.join(GOLDEN, f"{name}.jc"), "rb") as f:
        blob = f.read()
    out = decompress_to_ycbcr(blob)
    assert list(out.shape) == entry["decoded_shape"]
    assert hashlib.sha256(out.tobytes()).hexdigest() == \
        entry["decoded_sha256"]
