"""f32 cross-path campaign: randomized ragged geometries x quantizers,
Pallas packed-panel paths and XLA f32 paths vs the independent f64
oracle under the +-1-at-provable-ties contract (jpeg_tpu/utils/parity.py).

The f64 parity campaign (parity_campaign.py) proves byte parity with the
live reference in x64 mode; THIS campaign proves the f32 fast path's
honest contract — every cross-formulation disagreement is a +-1 flip at
an exact half-integer rounding tie of the f64 value, and both paths match
the f64 reference everywhere else.  Covers the any-geometry combined
pr-major decode (ops/band.py combined_p) that round 4 shipped with a
single drawn input per shape.

Usage:  JAX_PLATFORMS=cpu python benchmarks/tie_campaign.py [N] [SEED]

Prints one summary line; exit code 0 iff every draw satisfies the
contract.  Runs on the CPU backend (interpret-mode kernels); the on-chip
spot checks live in tpu_tests/test_on_device.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from jpeg_tpu.config import Configuration, QuantizationMethod  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.utils import parity as PAR  # noqa: E402


def _draw(rng):
    d = int(rng.choice([2, 3, 4, 8, 12, 16, 24]))
    bs = int(rng.integers(1, 5))
    tr = str(rng.choice(["DCT", "DCT", "DFT"]))
    qname = str(rng.choice(["none", "discard", "divide", "qtable"]))
    if qname == "qtable":
        d = 8
    params = {}
    if qname == "discard":
        params = {"keep": int(rng.integers(1, d + 1))}
    elif qname == "divide":
        params = {"divisor": int(rng.choice([2, 13, 40, 129, 1000]))}
    # Bias hard toward ragged geometry (non-divisible at both stages).
    w = int(rng.integers(1, 4 * bs * d + 7))
    h = int(rng.integers(1, 4 * bs * d + 7))
    return Configuration(width=w, height=h, block_size=bs, dct_size=d,
                         transform=tr,
                         quantization=QuantizationMethod(qname, **params))


def main(n=200, seed=20260820):
    rng = np.random.default_rng(seed)
    flips_enc = flips_dec = 0
    for i in range(n):
        cfg = _draw(rng)
        key = band_ops.config_key(cfg)
        band = rng.integers(0, 256, (cfg.height, cfg.width)).astype(np.int32)
        desc = (f"w={cfg.width} h={cfg.height} bs={cfg.block_size} "
                f"d={cfg.dct_size} {cfg.transform} {cfg.quantization.name}")
        try:
            f_xla = jax.jit(band_ops.make_encode(key, "float32", False))
            f_pal = jax.jit(band_ops.make_encode(key, "float32", True))
            g_xla = jax.jit(band_ops.make_decode(key, "float32", False))
            g_pal = jax.jit(band_ops.make_decode(key, "float32", True))
            lv_x = np.asarray(f_xla(band))
            lv_p = np.asarray(f_pal(band))
            lv_ref, et = PAR.encode_reference_and_ties(cfg, band)
            PAR.assert_tie_equal(lv_x, lv_ref, et, "encode xla vs f64")
            PAR.assert_tie_equal(lv_p, lv_ref, et, "encode pallas vs f64")
            px_x = np.asarray(g_xla(lv_x))
            px_p = np.asarray(g_pal(lv_x))
            px_ref, dt = PAR.decode_reference_and_ties(cfg, lv_x)
            PAR.assert_tie_equal(px_x, px_ref, dt, "decode xla vs f64")
            PAR.assert_tie_equal(px_p, px_ref, dt, "decode pallas vs f64")
        except AssertionError as e:
            print(f"FAIL draw {i} ({desc}): {e}")
            return 1
        flips_enc += int((lv_p != lv_x).any())
        flips_dec += int((px_p != px_x).any())
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{n} ...", flush=True)
    print(f"{n}/{n} draws satisfy the f32 tie contract "
          f"({flips_enc} draws had encode tie flips, {flips_dec} decode)")
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260820
    sys.exit(main(n, seed))
