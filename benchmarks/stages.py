"""Per-stage encode/decode timing breakdown on the current backend.

Usage:  python benchmarks/stages.py [H W [reps]]

Separates the pipeline into host->device transfer, device coefficient+entropy
compute, device->host pull, and host entropy/container work, each fenced with
block_until_ready — the numbers that tell you whether a deployment is
transfer-bound (tunnelled dev chip) or compute-bound (local chip).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

from jpeg_tpu import Configuration, QuantizationMethod, api, entropy  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.utils.profiling import StageTimer  # noqa: E402


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    img = np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8)

    print(f"backend={jax.default_backend()}  image={h}x{w}x3  reps={reps}")
    blob = api.compress_ycbcr(img, cfg)            # warm/compile
    api.decompress_to_ycbcr(blob)
    print(f"compressed: {img.nbytes} -> {len(blob)} bytes "
          f"({img.nbytes / len(blob):.2f}x)")

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    planes = np.ascontiguousarray(img.transpose(2, 0, 1))

    t = StageTimer()
    enc_levels = api._encode3_fn(key, dt.name, pal)
    for _ in range(reps):
        with t.stage("h2d+coeff (levels fn)") as s:
            lv16, mx = enc_levels(planes)
            s.fence(mx)
        with t.stage("d2h levels int16"):
            lv = np.asarray(lv16)
        with t.stage("host entropy encode"):
            streams = [entropy.encode_levels(b) for b in lv]
        with t.stage("full compress_ycbcr"):
            api.compress_ycbcr(img, cfg)
        with t.stage("full decompress"):
            api.decompress_to_ycbcr(blob)
        nb, L = cfg.num_blocks, cfg.dct_size ** 2
        with t.stage("host entropy decode"):
            [entropy.decode_levels(s, nb, L) for s in streams]
    print(t)
    per_img = t.totals["full compress_ycbcr"] / reps
    print(f"encode: {per_img * 1e3:.1f} ms/img -> {h * w / per_img / 1e6:.1f}"
          f" MP/s;  decode: "
          f"{t.totals['full decompress'] / reps * 1e3:.1f} ms/img")


if __name__ == "__main__":
    main()
