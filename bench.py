"""Benchmark: end-to-end encode throughput vs the pure-Python reference.

Prints ONE JSON line:
  {"metric": "encode_throughput", "value": <MP/s>, "unit": "megapixels/s",
   "vs_baseline": <speedup over the reference encoder on this host>}

Methodology
-----------
* Workload: full image compress (device coefficient path for all 3 YCbCr
  bands + host entropy coding + container pack) at the north-star config
  (dct_size=8, qtable quantizer, block_size=2) on a 2048x2048 RGB image.
  Throughput counts *image* pixels (H*W), i.e. one unit of work = 3 bands,
  matching how a user experiences "compress this image".
* Baseline: the reference implementation's ``compress_band`` measured live
  from /root/reference on a small band (its per-pixel cost is size-
  independent: serial Python loops), converted to image pixels (/3).  If the
  reference isn't present, a recorded measurement from this host is used
  (see _RECORDED_BASELINE below).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Band MP/s of the reference measured on this container's CPU
# (48x64 qtable/DCT/bs=2 band, 20 s of repetitions, 2026-08-16).
_RECORDED_BASELINE_BAND_MPS = 0.2299

IMG_H = int(os.environ.get("BENCH_H", 2048))
IMG_W = int(os.environ.get("BENCH_W", 2048))
REPS = int(os.environ.get("BENCH_REPS", 5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_image(h: int, w: int, channels: int = 3) -> np.ndarray:
    """Natural-image-like content: smooth structure + texture + mild noise.

    Pure random noise is the worst case for any entropy coder and looks
    nothing like the photographic inputs the codec targets; the same
    generator feeds both our measurement and the reference baseline.
    """
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    for c in range(channels):
        plane = (128
                 + 70 * np.sin(x / (17 + 6 * c)) * np.cos(y / (23 - 4 * c))
                 + 30 * np.sin((x + y) / (9 + 2 * c))
                 + 8 * rng.standard_normal((h, w)))
        out.append(np.clip(plane, 0, 255))
    return np.stack(out, axis=-1).astype(np.uint8)


def measure_reference_band_mps(budget_s: float = 6.0) -> float:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    try:
        import reference_oracle
        if not reference_oracle.available():
            raise RuntimeError("no reference")
        ref = reference_oracle.load()
        P = ref.pipeline
        cfg = P.Configuration(width=64, height=48, block_size=2, dct_size=8,
                              transform="DCT",
                              quantization=P.QuantizationMethod("qtable"))
        band = synth_image(48, 64, channels=1)[:, :, 0].astype(int)
        P.compress_band(band, cfg)  # warm
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < budget_s:
            P.compress_band(band, cfg)
            n += 1
        dt = (time.perf_counter() - t0) / n
        return 48 * 64 / dt / 1e6
    except Exception as e:  # noqa: BLE001
        log(f"reference measurement unavailable ({e}); using recorded baseline")
        return _RECORDED_BASELINE_BAND_MPS


def _backend_usable(timeout_s: int = 150) -> bool:
    """Probe backend init in a subprocess: a dead TPU tunnel HANGS
    jax.devices() rather than erroring, which would hang the whole bench."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_KERNEL_SMOKE = """
import numpy as np, jax, jax.numpy as jnp
from jpeg_tpu.entropy import device_codec as DC
from jpeg_tpu import entropy
rng = np.random.default_rng(0)
lv = np.zeros((600, 64), np.int32)
m = rng.random(lv.shape) < 0.1
lv[m] = rng.integers(-2000, 2000, int(m.sum()))
buf, bb = jax.jit(DC.encode_stream)(jnp.asarray(lv))
total = int(np.asarray(bb).sum())
assert np.asarray(buf)[:total].tobytes() == entropy.encode_levels(lv)
"""


def _kernel_smoke_ok(timeout_s: int = 900) -> bool:
    """Compile + run the production encode kernels on the live backend in a
    subprocess (first remote Mosaic/XLA compile can take minutes).  If it
    fails, the bench falls back to the proven kernel variants rather than
    crashing — new-kernel regressions then cost speed, not the artifact."""
    import subprocess
    try:
        r = subprocess.run([sys.executable, "-c", _KERNEL_SMOKE],
                           timeout=timeout_s, capture_output=True)
        if r.returncode != 0:
            log(f"kernel smoke failed:\n{r.stderr.decode()[-800:]}")
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        log("kernel smoke timed out")
        return False


def main() -> None:
    if not _backend_usable():
        log("WARNING: accelerator backend unusable (tunnel down?); "
            "falling back to CPU — numbers do NOT reflect TPU throughput")
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif not _kernel_smoke_ok():
        log("WARNING: production kernel smoke failed on this backend; "
            "benching with the fallback kernel variants "
            "(JPEG_TPU_ENC_TABLES=1 JPEG_TPU_MERGE_XLA=1)")
        os.environ["JPEG_TPU_ENC_TABLES"] = "1"
        os.environ["JPEG_TPU_MERGE_XLA"] = "1"
        if not _kernel_smoke_ok():
            log("WARNING: fallback kernels failed too; host entropy only")
            os.environ["JPEG_TPU_HOST_ENTROPY"] = "1"
    from jpeg_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from jpeg_tpu import Configuration, QuantizationMethod, compress_ycbcr

    cfg = Configuration(width=IMG_W, height=IMG_H, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    img = synth_image(IMG_H, IMG_W)

    log(f"warmup compile ({IMG_H}x{IMG_W})...")
    blob = compress_ycbcr(img, cfg)
    log(f"compressed {IMG_H * IMG_W * 3} -> {len(blob)} bytes "
        f"({IMG_H * IMG_W * 3 / len(blob):.2f}x)")

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        compress_ycbcr(img, cfg)
        times.append(time.perf_counter() - t0)
    # Mean, matching the reference baseline's mean-over-budget measurement
    # (a min/mean mix would overstate the speedup).
    dt = sum(times) / len(times)
    ser_mps = IMG_H * IMG_W / dt / 1e6
    log(f"encode serial: {dt * 1e3:.1f} ms mean-of-{REPS} "
        f"(best {min(times) * 1e3:.1f}) -> {ser_mps:.1f} MP/s")

    # Pipelined stream of images (the batch-driver workload): image i+1's
    # upload + device compute overlap image i's result pull.
    from jpeg_tpu import compress_many
    imgs = [img] * REPS
    compress_many(imgs[:2], cfg)  # warm the pipeline path
    t0 = time.perf_counter()
    blobs = compress_many(imgs, cfg)
    pdt = (time.perf_counter() - t0) / REPS
    mps = IMG_H * IMG_W / pdt / 1e6
    assert blobs[0] == blob, "pipelined bytes != serial bytes"
    log(f"encode pipelined(x{REPS}): {pdt * 1e3:.1f} ms/img -> {mps:.1f} MP/s")
    if mps < ser_mps:
        # Tunnel jitter can invert the two; the pipelined figure stays the
        # headline (fixed in advance — best-of-two would overstate).
        log(f"NOTE: pipelined ({mps:.1f}) < serial ({ser_mps:.1f}) MP/s "
            "this run — tunnel jitter; both reported, pipelined is the "
            "headline")

    # Decode throughput (reported on stderr; encode stays the headline).
    # decode_mps quotes the SERIAL number — the default single-image API
    # (decompress_to_ycbcr) and, on this tunnel, the faster variant: the
    # r4 pipelining probe (benchmarks/probes/probe_pipeline.py) showed the
    # 12 MB host plane pull dominates both variants host->host, so the
    # overlapped pipeline only wins with a device-resident consumer.  Same
    # fixed-in-advance rule as the encode headline (never best-of-two).
    from jpeg_tpu import decompress_many, decompress_to_ycbcr
    decompress_to_ycbcr(blob)  # warm
    dtimes = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        decompress_to_ycbcr(blob)
        dtimes.append(time.perf_counter() - t0)
    ddt = sum(dtimes) / len(dtimes)
    log(f"decode serial: {ddt * 1e3:.1f} ms mean-of-{REPS} "
        f"-> {IMG_H * IMG_W / ddt / 1e6:.1f} MP/s")
    t0 = time.perf_counter()
    decompress_many([blob] * REPS)
    pddt = (time.perf_counter() - t0) / REPS
    log(f"decode pipelined(x{REPS}): {pddt * 1e3:.1f} ms/img "
        f"-> {IMG_H * IMG_W / pddt / 1e6:.1f} MP/s")

    base_band = measure_reference_band_mps()
    base_img = base_band / 3.0  # reference does 3 serial band passes per image
    log(f"reference baseline: {base_band:.4f} band MP/s "
        f"-> {base_img:.4f} image MP/s")

    import jax
    print(json.dumps({
        "metric": "encode_throughput",
        "value": round(mps, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(mps / base_img, 1),
        "backend": jax.default_backend(),
        "serial_mps": round(ser_mps, 2),
        "decode_mps": round(IMG_H * IMG_W / ddt / 1e6, 2),
        "decode_pipelined_mps": round(IMG_H * IMG_W / pddt / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
