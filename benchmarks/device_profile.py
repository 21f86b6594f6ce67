"""Device-resident per-stage profile of the encode/decode pipeline.

Times each jitted stage on DEVICE-RESIDENT inputs with async dispatch:
N calls are queued back-to-back and fenced once at the end, so per-call
host->device dispatch latency (large through the axon tunnel) amortizes
away and the number approximates pure chip time per call.

Usage:  python benchmarks/device_profile.py [H W [reps]] [--json out.json]

Stages:
  coeff_enc      (3, H, W) pixels -> (3, N, L) int32 levels (Pallas/XLA path)
  entropy_enc    (3N, L) levels -> device bitstream (entropy/device_codec.py)
  fused_enc      one program: pixels -> bitstream + band lengths (api path)
  entropy_dec    (stream, starts) -> (3N, L) levels (device bit parsing)
  coeff_dec      (3, N, L) levels -> (3, H, W) uint8 planes
  fused_dec      one program: (stream, starts) -> planes
"""
from __future__ import annotations

import json
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

import jax.numpy as jnp  # noqa: E402

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402


def timeit(fn, args, reps: int, warmup: int = 2) -> float:
    """Mean seconds/call with async dispatch and a single trailing fence."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    h = int(argv[0]) if len(argv) > 0 else 2048
    w = int(argv[1]) if len(argv) > 1 else 2048
    reps = int(argv[2]) if len(argv) > 2 else 10
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 30 * np.sin((yx[0] + yx[1]) / 9.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    img = np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8)
    planes = np.ascontiguousarray(img.transpose(2, 0, 1))
    mp = h * w / 1e6

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    nb, L = cfg.num_blocks, cfg.dct_size ** 2
    print(f"backend={jax.default_backend()} image={h}x{w} ({mp:.1f} MP) "
          f"blocks={3 * nb} L={L} pallas={pal} reps={reps}", file=sys.stderr)

    dev = jax.devices()[0]
    planes_d = jax.device_put(planes, dev)

    results = {}

    def record(name, secs):
        results[name] = {"ms": round(secs * 1e3, 3),
                         "mps": round(mp / secs, 1)}
        print(f"{name:14s} {secs * 1e3:8.2f} ms  {mp / secs:8.1f} MP/s",
              file=sys.stderr)

    # --- coefficient encode only ---
    enc = band_ops.make_encode(key, dt.name, pal)
    coeff_fn = jax.jit(lambda b: jax.vmap(enc)(b))
    record("coeff_enc", timeit(coeff_fn, (planes_d,), reps))
    levels_d = jax.block_until_ready(coeff_fn(planes_d))  # (3, N, L) device
    flat_d = jax.block_until_ready(
        jax.jit(lambda x: x.reshape(-1, x.shape[-1]))(levels_d))

    # --- device entropy encode only ---
    ent_fn = jax.jit(DC.encode_stream)
    record("entropy_enc", timeit(ent_fn, (flat_d,), reps))

    # --- fused encode (api path) ---
    fused = api._encode3_stream_fn(key, dt.name, pal)
    record("fused_enc", timeit(fused, (planes_d,), reps))

    # --- decode inputs: true stream + block starts ---
    stream, band_bytes, _ = jax.block_until_ready(fused(planes_d))
    bb = [int(x) for x in np.asarray(band_bytes)]
    total = sum(bb)
    buf = np.asarray(stream)[:total]
    print(f"stream: {total} bytes ({3 * h * w / total:.2f}x)", file=sys.stderr)
    host_levels = np.asarray(flat_d)
    # Block start offsets straight from the encoder's own per-block counts.
    _, blk_b = jax.block_until_ready(jax.jit(DC.encode_stream)(flat_d))
    blk_bytes = np.asarray(blk_b)
    starts = np.concatenate([[0], np.cumsum(blk_bytes)[:-1]]).astype(np.int32)

    from jpeg_tpu.utils.device import pow2_cap
    pad = pow2_cap(total)
    arr = np.zeros(pad, np.uint8)
    arr[:total] = buf
    arr_d = jax.device_put(arr, dev)
    starts_d = jax.device_put(starts, dev)

    # --- device entropy decode only ---
    dec_ent = jax.jit(lambda s, st: DC.decode_stream(s, st, L))
    lv_out = jax.block_until_ready(dec_ent(arr_d, starts_d))
    assert np.array_equal(np.asarray(lv_out), host_levels), "decode mismatch"
    record("entropy_dec", timeit(dec_ent, (arr_d, starts_d), reps))

    # --- coefficient decode only ---
    dec = band_ops.make_decode(key, dt.name, pal)
    dec_fn = jax.jit(lambda lv: jax.vmap(dec)(lv.reshape(3, nb, L))
                     .astype(jnp.uint8))
    record("coeff_dec", timeit(dec_fn, (flat_d,), reps))

    # --- fused decode (api path) ---
    fdec = api._decode3_stream_fn(key, dt.name, pal, pad)
    record("fused_dec", timeit(fdec, (arr_d, starts_d), reps))

    if out_json:
        with open(out_json, "w") as f:
            json.dump({"image": [h, w], "megapixels": mp, "reps": reps,
                       "backend": jax.default_backend(),
                       "stages": results}, f, indent=1)
        print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
