"""On-chip probe: ONE-dispatch host-free foreign decode vs the default
host-scan-then-device-parse path, plus the pure-Python scanner baseline
that sets the auto policy threshold (entropy/device_scan.py:scan_mode).

A "foreign" stream is one that arrives from outside (no encoder byte
counts available): the serial boundary scan must run somewhere.  Choices:

  host_scan         C++ jt_scan_offsets wall time (3 bands on a pool) —
                    the default path's host-side cost
  entropy_dec       device bit parse + IDCT given host starts (marginal)
  foreign_dec       scan + bit parse + dequant + IDCT + clamp in ONE
                    program (api._decode3_foreign_fn's body, marginal)
  numpy_scan        pure-Python scanner wall (the no-compiler fallback
                    the device path replaces)
"""
from __future__ import annotations

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.entropy import device_scan as DS  # noqa: E402
from jpeg_tpu.entropy import numpy_codec as NC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.utils.device import quarter_cap  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "2"))
K2 = int(os.environ.get("CHAIN_K2", "10"))

_c = itertools.count(1)


def _salt():
    return jax.device_put(np.int32(next(_c)))


def _wall_best(fn, *a, reps: int = 5) -> float:
    jax.block_until_ready(fn(*a, _salt()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a, _salt()))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(body, init) -> float:
    def chain(k):
        return jax.jit(lambda x, s: (
            jax.lax.fori_loop(0, k, lambda i, c: body(c), x), s))
    return max(0.0, (_wall_best(chain(K2), init)
                     - _wall_best(chain(K1), init)) / (K2 - K1))


def dep(x):
    x = jax.lax.optimization_barrier(x)
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


def main() -> None:
    h = w = int(os.environ.get("PROBE_HW", "2048"))
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 30 * np.sin((yx[0] + yx[1]) / 9.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    planes = np.repeat(plane[None], 3, 0).astype(np.uint8)
    mp = h * w / 1e6

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    nb, L = cfg.num_blocks, cfg.dct_size ** 2
    enc = band_ops.make_encode_batch(key, dt.name, pal)
    lv = np.asarray(jax.jit(enc)(jax.device_put(planes))).reshape(3, nb, L)
    streams = [entropy.encode_levels(lv[b]) for b in range(3)]
    buf = b"".join(streams)
    total = len(buf)
    print(f"backend={jax.default_backend()} {mp:.1f} MP stream={total} B "
          f"blocks={3 * nb} chain {K1}->{K2}", file=sys.stderr)

    # --- host C++ scan wall (3 bands on a pool, as the api does) ---------
    from concurrent.futures import ThreadPoolExecutor
    def host_scan():
        with ThreadPoolExecutor(max_workers=3) as pool:
            return list(pool.map(
                lambda s: entropy.scan_offsets(s, nb, L), streams))
    scans = host_scan()
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        host_scan()
        best = min(best, time.perf_counter() - t0)
    print(f"host_scan (C++)    {best * 1e3:8.3f} ms wall", file=sys.stderr)

    # --- device parse given host starts (the default device half) --------
    starts, off = [], 0
    for s, sc in zip(streams, scans):
        starts.append(sc + off)
        off += len(s)
    all_starts = np.concatenate(starts)
    max_bb = max(DC.max_block_bytes_of(sc, len(s))
                 for s, sc in zip(streams, scans))
    bucket_bb = DC.bucket_block_bytes(L, max_bb)
    srt = DC.sort_pays_off(all_starts, total)
    pad = quarter_cap(total)
    arr = np.zeros(pad, np.uint8)
    arr[:total] = np.frombuffer(buf, np.uint8)
    arr_d = jax.device_put(DC.host_stream_arg(arr))
    st_d = jax.device_put(all_starts.astype(np.int32))
    tot = np.int32(total)
    dec = band_ops.make_decode(key, dt.name, pal)

    def ent_dec(st):
        lvx = DC.decode_stream(arr_d, st, L, bucket_bb, sort=srt,
                               total_len=tot)
        p = jax.vmap(dec)(lvx.reshape(3, nb, L))
        return st + dep(p)

    t_parse = marginal(ent_dec, st_d)
    print(f"dec w/ host starts {t_parse * 1e3:8.3f} ms marginal "
          f"(+ scan {best * 1e3:.2f} ms host)", file=sys.stderr)

    # --- fused one-dispatch foreign decode -------------------------------
    ends = jax.device_put(
        np.cumsum([len(s) for s in streams]).astype(np.int32))
    rungs = DS.span_rungs(L)
    rung = next((r for r in rungs if r and max_bb <= r), 0)
    mb = DC.bucket_block_bytes(L, rung) if rung else 0
    print(f"rung={rung} (max_bb={max_bb}) decode mb={mb}", file=sys.stderr)

    def foreign(x):
        starts2, ok = DS.scan_bands_starts(arr_d, ends, nb, L,
                                           span_cap=rung)
        lvx = DC.decode_stream(arr_d, starts2, L, mb, sort=False,
                               total_len=ends[-1])
        p = jax.vmap(dec)(lvx.reshape(3, nb, L))
        return x + dep(p) + jnp.where(ok, 0, 1)

    # correctness first
    st2, ok = jax.jit(lambda: DS.scan_bands_starts(
        arr_d, ends, nb, L, span_cap=rung))()
    assert bool(ok), "fused scan rejected a valid stream"
    assert np.array_equal(np.asarray(st2), all_starts), "fused starts differ"

    t_foreign = marginal(foreign, jax.device_put(np.int32(0)))
    print(f"foreign_dec fused  {t_foreign * 1e3:8.3f} ms marginal "
          f"(one dispatch, host-free)", file=sys.stderr)

    # --- scan-only marginal (the fused program's scan share) -------------
    def scan_only(x):
        starts2, ok = DS.scan_bands_starts(arr_d, ends, nb, L, span_cap=rung)
        return x + dep(starts2) + jnp.where(ok, 0, 1)

    t_scan = marginal(scan_only, jax.device_put(np.int32(0)))
    print(f"device scan share  {t_scan * 1e3:8.3f} ms marginal",
          file=sys.stderr)

    # --- pure-Python scanner baseline (policy threshold) -----------------
    small = streams[0][:min(len(streams[0]), 1 << 17)]
    # scan a PREFIX of whole blocks: count blocks whose start < len(small)
    sc0 = scans[0]
    nb_small = int((sc0 < len(small)).sum()) - 1
    small = small[:int(sc0[nb_small])]
    t0 = time.perf_counter()
    NC.scan_offsets(small, nb_small, L)
    t_py = time.perf_counter() - t0
    print(f"numpy_scan         {t_py * 1e3:8.3f} ms wall for "
          f"{len(small)} B -> {len(small) / t_py / 1e6:.2f} MB/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
