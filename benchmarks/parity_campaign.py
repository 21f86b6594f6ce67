"""Round-end parity campaign: randomized configs x random bands vs the
live reference (reference pipeline/__init__.py:71-88), byte parity both
directions in x64 parity mode.

Usage:  JAX_PLATFORMS=cpu python benchmarks/parity_campaign.py [N] [SEED]

For each draw: random (w, h, block_size, dct_size, transform, quantizer),
random uint8 band.  Checks
  * our compress_band bytes == reference compress_band bytes,
  * our decompress of those bytes == reference decompress (exact ints),
  * draws the reference rejects (unrepresentable amplitudes,
    util.py:162-174) we must reject identically with BadRleCodeError.
Prints one summary line; exit code 0 iff all draws clean.
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 parity mode

import numpy as np  # noqa: E402

from tests import reference_oracle  # noqa: E402
from jpeg_tpu import compress_band, decompress_band  # noqa: E402
from jpeg_tpu.config import Configuration, QuantizationMethod  # noqa: E402
from jpeg_tpu.config import BadRleCodeError  # noqa: E402


def _configs(rng):
    w = int(rng.integers(1, 48))
    h = int(rng.integers(1, 48))
    bs = int(rng.integers(1, 6))
    d = int(rng.choice([1, 2, 3, 4, 5, 8, 12, 16]))
    tr = str(rng.choice(["DCT", "DCT", "DCT", "DFT"]))
    qname = str(rng.choice(["none", "discard", "divide", "qtable"]))
    if qname == "qtable":
        d = 8
    params = {}
    if qname == "discard":
        params = {"keep": int(rng.integers(1, d + 1))}
    elif qname == "divide":
        params = {"divisor": int(rng.choice([2, 13, 40, 129, 1000]))}
    ref = reference_oracle.load()
    rq = ref.pipeline.QuantizationMethod(qname, **params)
    rcfg = ref.pipeline.Configuration(
        width=w, height=h, block_size=bs, dct_size=d, transform=tr,
        quantization=rq)
    ocfg = Configuration(
        width=w, height=h, block_size=bs, dct_size=d, transform=tr,
        quantization=QuantizationMethod(qname, **params))
    return ref, rcfg, ocfg, (w, h, bs, d, tr, qname, params)


def main(n=150, seed=31337):
    ref = reference_oracle.load()
    import util as ref_util  # noqa: F401  (reference module)
    rng = np.random.default_rng(seed)
    equal = rejected = 0
    for i in range(n):
        ref, rcfg, ocfg, desc = _configs(rng)
        a = rng.integers(0, 256, size=(desc[1], desc[0])).astype(np.int64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                ref_bytes = ref.pipeline.compress_band(a.copy(), rcfg)
            except ref_util.BadRleCodeError:
                try:
                    compress_band(a, ocfg)
                except BadRleCodeError:
                    rejected += 1
                    continue
                print(f"FAIL draw {i}: ref rejected, we accepted: {desc}")
                return 1
            ours = compress_band(a, ocfg)
            if ours != ref_bytes:
                print(f"FAIL draw {i}: encode bytes differ: {desc}")
                return 1
            ref_plane = np.asarray(
                ref.pipeline.decompress_band(ref_bytes, rcfg)
            ).reshape(desc[1], desc[0])
            mine = np.asarray(decompress_band(ref_bytes, ocfg))
            if not np.array_equal(mine, ref_plane):
                print(f"FAIL draw {i}: decode planes differ: {desc}")
                return 1
            equal += 1
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{n} ...", flush=True)
    print(f"{n}/{n} clean — {equal} byte-equal both directions, "
          f"{rejected} rejected identically by both implementations")
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 31337
    sys.exit(main(n, seed))
