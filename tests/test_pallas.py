"""Pallas fused-kernel tests (interpreter mode on the CPU backend).

Cross-path f32 contract (jpeg_tpu/utils/parity.py): two f32 evaluation
orders of the same linear map agree bitwise EXCEPT at positions where the
exact f64 pre-round value sits within the f32 accumulation error of an
exact half-integer ``round()`` tie — there they may differ by exactly 1.
Kernel-vs-XLA comparisons at identical matmul shapes assert full bitwise
equality; comparisons across different formulations (packed panels vs
plain dots, combined vs two-step operators) assert the tie contract
against the f64 reference.

Every test draws its inputs from its own seeded Generator so a failure
reproduces standalone, in any suite order.
"""
import zlib

import numpy as np
import pytest
import jax.numpy as jnp

from jpeg_tpu.config import QuantizationMethod
from jpeg_tpu.ops import pallas_kernels as PK
from jpeg_tpu.ops import quantize as Q
from jpeg_tpu.ops import transform as T
from jpeg_tpu.utils import parity as PAR

D = 8
L = D * D


def _epilogue_vectors(method: QuantizationMethod):
    mul = np.ones(L)
    div = np.ones(L)
    mask = np.ones(L)
    if method.name == "discard":
        mask = Q.discard_mask_zigzag(D, method.keep)
    elif method.name == "divide":
        div = float(method.divisor) * np.ones(L)
    elif method.name == "qtable":
        mul = 1.0 / Q.qtable_zigzag(D)
    return (jnp.asarray(mul), jnp.asarray(div), jnp.asarray(mask))


def _deq_vector(method: QuantizationMethod):
    if method.name == "qtable":
        return jnp.asarray(Q.qtable_zigzag(D).astype(np.int64))
    if method.name == "divide":
        return jnp.asarray(int(method.divisor) * np.ones(L, np.int64))
    return jnp.asarray(np.ones(L, np.int64))


@pytest.mark.parametrize("method", [
    QuantizationMethod("none"),
    QuantizationMethod("discard", keep=3),
    QuantizationMethod("divide", divisor=100),
    QuantizationMethod("qtable"),
], ids=lambda m: m.name)
@pytest.mark.parametrize("n", [1, 7, PK.TILE, PK.TILE + 5])
def test_encode_kernel_matches_xla(method, n):
    # Same (N, L) @ (L, L) shape on both sides -> full bitwise equality.
    rng = np.random.default_rng(zlib.crc32(f"enc-{method.name}-{n}".encode()))
    blocks = rng.integers(0, 256, (n, L)).astype(np.float32)
    opt = jnp.asarray(T.encode_operator(D).T)

    coeffs = T.dct2_zigzag(jnp.asarray(blocks, jnp.float32), D)
    want = np.asarray(Q.quantize(coeffs, method, D)).astype(np.int32)

    mul, div, mask = _epilogue_vectors(method)
    got = PK.encode_blocks(jnp.asarray(blocks), opt, mul, div, mask,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("method", [
    QuantizationMethod("none"),
    QuantizationMethod("divide", divisor=40),
    QuantizationMethod("qtable"),
], ids=lambda m: m.name)
def test_decode_kernel_matches_xla(method):
    rng = np.random.default_rng(zlib.crc32(f"dec-{method.name}".encode()))
    n = 33
    blocks = rng.integers(0, 256, (n, L)).astype(np.float32)
    coeffs = T.dct2_zigzag(jnp.asarray(blocks, jnp.float32), D)
    levels = np.asarray(Q.quantize(coeffs, method, D)).astype(np.int32)

    deq = np.asarray(Q.dequantize(jnp.asarray(levels, jnp.int64), method, D))
    pix = T.izigzag_idct2(jnp.asarray(deq, jnp.float32), D)
    want = np.asarray(jnp.clip(jnp.round(pix), 0, 255)).astype(np.int32)

    wt = jnp.asarray(T.decode_operator(D).T)
    got = PK.decode_blocks(jnp.asarray(levels), wt, _deq_vector(method),
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_decode_roundtrip_quality():
    # Encode+decode through the kernels alone reconstructs blocks closely.
    rng = np.random.default_rng(41)
    n = 64
    blocks = rng.integers(0, 256, (n, L)).astype(np.float32)
    method = QuantizationMethod("none")
    opt = jnp.asarray(T.encode_operator(D).T)
    wt = jnp.asarray(T.decode_operator(D).T)
    mul, div, mask = _epilogue_vectors(method)
    levels = PK.encode_blocks(jnp.asarray(blocks), opt, mul, div, mask,
                              interpret=True)
    recon = PK.decode_blocks(levels, wt, _deq_vector(method), interpret=True)
    assert np.abs(np.asarray(recon) - blocks).max() <= 1.0


@pytest.mark.parametrize("d,transform", [
    (2, "DCT"), (4, "DCT"), (8, "DCT"),
    # d=24 is BASELINE config 3's shape family; ragged geometry exercises
    # the any-geometry combined pr-major decode (crop after superblocks)
    (24, "DCT"), (8, "DFT"),
])
@pytest.mark.parametrize("seed", [0, 1])
def test_packed_band_encode_decode_matches_xla(d, transform, seed):
    """Pallas packed-panel paths vs the XLA f32 paths, checked against the
    independent f64 oracle under the tie contract (utils/parity.py): both
    must match the f64 levels/plane exactly except +-1 at provable f32
    rounding ties, and any pallas-vs-XLA disagreement must itself be at a
    tie.  (Bitwise equality across formulations is genuinely false: the
    packed block-diagonal contraction and XLA's shape-blocked dots order
    f32 adds differently, and exact .5 pre-round values land either side.)
    """
    import jax
    from jpeg_tpu.config import Configuration
    from jpeg_tpu.ops import band as band_ops

    rng = np.random.default_rng(
        zlib.crc32(f"packed-{d}-{transform}-{seed}".encode()))
    w = d * 2 * 5 + 3            # ragged geometry
    h = d * 2 * 3 + 1
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=d,
                        transform=transform,
                        quantization=QuantizationMethod("divide", divisor=40))
    key = band_ops.config_key(cfg)
    band = rng.integers(0, 256, (h, w)).astype(np.int32)

    f_xla = jax.jit(band_ops.make_encode(key, "float32", use_pallas=False))
    f_pal = jax.jit(band_ops.make_encode(key, "float32", use_pallas=True))
    lv_x = np.asarray(f_xla(band))
    lv_p = np.asarray(f_pal(band))
    lv_ref, enc_ties = PAR.encode_reference_and_ties(cfg, band)
    PAR.assert_tie_equal(lv_x, lv_ref, enc_ties, "encode xla vs f64")
    PAR.assert_tie_equal(lv_p, lv_ref, enc_ties, "encode pallas vs f64")
    PAR.assert_tie_equal(lv_p, lv_x, enc_ties, "encode pallas vs xla")

    g_xla = jax.jit(band_ops.make_decode(key, "float32", use_pallas=False))
    g_pal = jax.jit(band_ops.make_decode(key, "float32", use_pallas=True))
    px_x = np.asarray(g_xla(lv_x))
    px_p = np.asarray(g_pal(lv_x))
    px_ref, dec_ties = PAR.decode_reference_and_ties(cfg, lv_x)
    PAR.assert_tie_equal(px_x, px_ref, dec_ties, "decode xla vs f64")
    PAR.assert_tie_equal(px_p, px_ref, dec_ties, "decode pallas vs f64")
    PAR.assert_tie_equal(px_p, px_x, dec_ties, "decode pallas vs xla")


def test_tie_contract_rejects_non_tie_mismatch():
    # The contract helper must actually catch a genuine (non-tie) bug.
    from jpeg_tpu.config import Configuration
    from jpeg_tpu.ops import band as band_ops
    rng = np.random.default_rng(23)
    cfg = Configuration(width=83, height=49, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("divide", divisor=40))
    key = band_ops.config_key(cfg)
    band = rng.integers(0, 256, (49, 83)).astype(np.int32)
    lv = np.asarray(band_ops.make_encode(key, "float32", False)(band))
    px_ref, ties = PAR.decode_reference_and_ties(cfg, lv)
    broken = px_ref.copy()
    broken[0, 0] += 7            # not a +-1 tie flip
    assert PAR.tie_diff_report(broken, px_ref, ties) is not None


def test_fused_plane_encode_matches_xla(monkeypatch):
    """Fully-fused plane kernel (interpret) == f32 XLA op-by-op path,
    for DCT and DFT, several quantizers and geometries."""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    from jpeg_tpu.config import Configuration
    from jpeg_tpu.ops import band as band_ops
    rng = np.random.default_rng(5)
    cases = [
        dict(width=128, height=96, block_size=2, dct_size=8,
             quantization=QuantizationMethod("qtable")),
        dict(width=64, height=32, block_size=1, dct_size=8,
             quantization=QuantizationMethod("divide", divisor=40)),
        dict(width=96, height=48, block_size=2, dct_size=4,
             quantization=QuantizationMethod("none")),
        dict(width=128, height=64, block_size=2, dct_size=8,
             transform="DFT", quantization=QuantizationMethod("none")),
    ]
    for kw in cases:
        cfg = Configuration(**kw)
        key = band_ops.config_key(cfg)
        band = rng.integers(0, 256, (cfg.height, cfg.width)).astype(np.int32)
        lv_pal = np.asarray(
            band_ops.make_encode(key, "float32", True)(jnp.asarray(band)))
        lv_xla = np.asarray(
            band_ops.make_encode(key, "float32", False)(jnp.asarray(band)))
        lv_ref, ties = PAR.encode_reference_and_ties(cfg, band)
        PAR.assert_tie_equal(lv_pal, lv_ref, ties, f"pallas vs f64 {kw}")
        PAR.assert_tie_equal(lv_xla, lv_ref, ties, f"xla vs f64 {kw}")
        PAR.assert_tie_equal(lv_pal, lv_xla, ties, f"pallas vs xla {kw}")


def test_fused_plane_gate_falls_back_on_odd_shapes(monkeypatch):
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    from jpeg_tpu.config import Configuration
    from jpeg_tpu.ops import band as band_ops
    rng = np.random.default_rng(6)
    # 50x34 with bs=2 -> 25x17 subsampled, needs DCT padding: must take the
    # sep_pad path and match the independent f64 oracle under the tie
    # contract (the pallas/xla flavors build the same program here, so the
    # oracle is what makes this a real test).
    cfg = Configuration(width=50, height=34, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    key = band_ops.config_key(cfg)
    band = rng.integers(0, 256, (34, 50)).astype(np.int32)
    lv_pal = np.asarray(
        band_ops.make_encode(key, "float32", True)(jnp.asarray(band)))
    lv_xla = np.asarray(
        band_ops.make_encode(key, "float32", False)(jnp.asarray(band)))
    lv_ref, ties = PAR.encode_reference_and_ties(cfg, band)
    PAR.assert_tie_equal(lv_pal, lv_ref, ties, "pallas vs f64")
    PAR.assert_tie_equal(lv_xla, lv_ref, ties, "xla vs f64")
    np.testing.assert_array_equal(lv_pal, lv_xla)


def test_combined_decode_matches_twostep(monkeypatch):
    """On divisible geometry the decode dual (dezigzag+IDCT+inflate as ONE
    matmul) must equal the explicit two-step chain under the tie contract
    — f32 XLA and the Pallas kernel (interpret) alike, DCT and DFT.  (The
    combined operator's rows are bitwise copies of the plain operator's,
    but the dots run at different shapes, so exact .5 pre-round ties may
    still flip; everything else is bitwise.)"""
    monkeypatch.setenv("JPEG_TPU_PALLAS", "interpret")
    from jpeg_tpu.config import Configuration
    from jpeg_tpu.ops import band as band_ops
    from jpeg_tpu.ops import blocks as B
    rng = np.random.default_rng(9)
    cases = [
        dict(width=128, height=96, block_size=2, dct_size=8,
             quantization=QuantizationMethod("qtable")),
        dict(width=96, height=48, block_size=3, dct_size=4,
             quantization=QuantizationMethod("divide", divisor=40)),
        dict(width=128, height=64, block_size=2, dct_size=8,
             transform="DFT", quantization=QuantizationMethod("none")),
    ]
    for kw in cases:
        cfg = Configuration(**kw)
        key = band_ops.config_key(cfg)
        d, bs = cfg.dct_size, cfg.block_size
        band = rng.integers(0, 256, (cfg.height, cfg.width)).astype(np.int32)
        lv = band_ops.make_encode(key, "float32", False)(jnp.asarray(band))

        # explicit two-step reference: deq -> IDCT -> round/clamp ->
        # deblockify -> inflate (the pre-combined decode chain)
        deq = Q.dequantize(lv.astype(jnp.int32), cfg.quantization, d)
        if cfg.transform == "DCT":
            pix = T.izigzag_idct2(deq.astype(jnp.float32), d)
        else:
            pix = T.izigzag_idft2_real(deq.astype(jnp.float32), d)
        pix = jnp.clip(jnp.round(pix), 0, 255).astype(jnp.int32)
        plane = B.deblockify(pix.reshape(
            cfg.blocks_high, cfg.blocks_wide, d, d))
        want = np.asarray(B.inflate(plane, bs))

        _, ties = PAR.decode_reference_and_ties(cfg, np.asarray(lv))
        got_xla = np.asarray(
            band_ops.make_decode(key, "float32", False)(lv))
        got_pal = np.asarray(
            band_ops.make_decode(key, "float32", True)(lv))
        PAR.assert_tie_equal(got_xla, want, ties, f"xla vs twostep {kw}")
        PAR.assert_tie_equal(got_pal, want, ties, f"pallas vs twostep {kw}")
