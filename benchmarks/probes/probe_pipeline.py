"""On-chip probe: WHY does pipelined decode tie/lose to serial on this link?

Round-3 claim (docs/ROUND3.md item 8): the tunnel serializes overlapped
RPCs, so overlapping blob i+1's host scan + device decode under blob i's
12 MB plane pull buys nothing — the pull dominates and cannot overlap.
This probe isolates that with three measurements:

  1. d2h alone vs two CONCURRENT d2h pulls (threads): a full-duplex link
     finishes two overlapped pulls in ~1x the serial time of one; a
     serializing link takes ~2x.
  2. h2d vs h2d overlapped with d2h (the decode pipeline's actual shape).
  3. Decode with a DEVICE-RESIDENT consumer (per-image checksum, 8-byte
     pull) — serial dispatch vs pipelined dispatch.  With the plane pull
     off the critical path, the async-dispatch overlap must win; this
     bounds what the same structure gains on a full-duplex link (PCIe).
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402


def best(fn, reps=5):
    fn()
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main() -> None:
    mb = 12
    nelem = mb << 20
    # jax Arrays CACHE their host copy after the first np.asarray — every
    # pull below must hit a FRESH array, pulled exactly once.
    reps = 4

    def fresh(n):
        out = [jax.device_put(np.full(nelem, 7 + i, np.uint8))
               for i in range(n)]
        jax.block_until_ready(out)
        return out

    pool = fresh(reps)
    t0 = time.perf_counter()
    for x in pool:
        np.asarray(x)
    t_pull = (time.perf_counter() - t0) / reps
    print(f"d2h {mb} MB alone            {t_pull * 1e3:8.1f} ms "
          f"({mb / t_pull:6.1f} MB/s)", flush=True)

    pool = fresh(2 * reps)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(lambda x: np.asarray(x), pool))
    t_two = (time.perf_counter() - t0) / reps
    print(f"2x d2h concurrent            {t_two * 1e3:8.1f} ms/pair "
          f"(ratio vs 1x: {t_two / t_pull:4.2f}; full-duplex ~1, "
          f"serialized ~2)", flush=True)

    host = np.arange(nelem, dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(host))
    t_push = (time.perf_counter() - t0) / reps
    print(f"h2d {mb} MB alone            {t_push * 1e3:8.1f} ms "
          f"({mb / t_push:6.1f} MB/s)", flush=True)

    pool = fresh(reps)
    t0 = time.perf_counter()
    for x in pool:
        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(lambda: jax.block_until_ready(
                jax.device_put(host)))
            f2 = ex.submit(lambda x=x: np.asarray(x))
            f1.result(), f2.result()
    t_pp = (time.perf_counter() - t0) / reps
    both = max(t_push, t_pull)
    print(f"h2d + d2h concurrent         {t_pp * 1e3:8.1f} ms "
          f"(ratio vs max(h2d,d2h): {t_pp / both:4.2f}; full-duplex ~1, "
          f"serialized ~{(t_push + t_pull) / both:4.2f})", flush=True)

    # --- decode with a device-resident consumer --------------------------
    h = w = 2048
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    blobs = []
    for i in range(4):
        plane = np.clip(128 + 70 * np.sin(yx[1] / (15 + i))
                        * np.cos(yx[0] / 21.0)
                        + 8 * rng.standard_normal((h, w)), 0, 255)
        img = np.repeat(plane[:, :, None], 3, 2).astype(np.uint8)
        blobs.append(api.compress_ycbcr(img, cfg))
    csum = jax.jit(lambda p: jnp.sum(p.astype(jnp.uint32)))

    def serial():
        out = []
        for b in blobs:
            planes = api._start_decompress(b, None)
            out.append(int(csum(planes)))    # fenced per image
        return out

    def pipelined():
        states = [api._start_decompress(b, None) for b in blobs]  # async
        return [int(csum(p)) for p in states]

    assert serial() == pipelined()
    t_s = best(serial, reps=3)
    t_p = best(pipelined, reps=3)
    mp = 4 * h * w / 1e6
    print(f"device-consumer decode serial    {t_s * 1e3:8.1f} ms "
          f"({mp / t_s:7.1f} MP/s)", flush=True)
    print(f"device-consumer decode pipelined {t_p * 1e3:8.1f} ms "
          f"({mp / t_p:7.1f} MP/s, {t_s / t_p:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
