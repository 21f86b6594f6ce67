"""On-chip probe: device boundary scan (Pallas walker) vs C++ scan.

Round-3 verdict item: the XLA per-byte-gather scan measured 156 ms vs
1.5 ms C++ for a 340 KB band.  This probe times the Mosaic funnel-walker
formulation (phase 1) and the pointer-doubling orbit join (phase 2+3)
separately, at two stream sizes, against the C++ scanner.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_scan as DS  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.utils.device import quarter_cap  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "2"))
K2 = int(os.environ.get("CHAIN_K2", "8"))


def _wall_best(fn, *args, reps: int = 5) -> float:
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(body, init) -> float:
    def chain(k):
        return jax.jit(
            lambda x: jax.lax.fori_loop(0, k, lambda i, c: body(c), x))
    t1 = _wall_best(chain(K1), init)
    t2 = _wall_best(chain(K2), init)
    return max(0.0, (t2 - t1) / (K2 - K1))


def dep(x):
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


def main() -> None:
    L = 64
    rng = np.random.default_rng(0)
    for nb in (16384, 49152):
        lv = np.zeros((nb, L), np.int32)
        m = rng.random(lv.shape) < 0.15
        lv[m] = rng.integers(-2000, 2000, int(m.sum()))
        data = entropy.encode_levels(lv)
        n = len(data)
        print(f"--- blocks={nb} stream={n} bytes "
              f"(pad {quarter_cap(n)})", flush=True)

        t0 = time.perf_counter()
        for _ in range(10):
            host = DS._host_scan(data, nb, L)   # NOT entropy.scan_offsets:
            # that routes back here under JPEG_TPU_DEVICE_SCAN=1
        t_cpp = (time.perf_counter() - t0) / 10
        print(f"C++ scan                 {t_cpp * 1e3:8.2f} ms", flush=True)

        # correctness on chip first
        starts, ok = DS.scan_offsets_device(data, nb, L)
        assert ok and np.array_equal(starts, host), "device scan mismatch"

        pad = quarter_cap(n)
        arr = np.zeros(pad, np.uint8)
        arr[:n] = np.frombuffer(data, np.uint8)
        arr_d = jax.device_put(DC.host_stream_arg(arr))
        nbits = jnp.int32(n * 8)
        P = pad

        # the rung scan_offsets_device settled on for this content
        rungs = DS.span_rungs(L)
        rung = rungs[DS._rung_cache.get(L, 0)]
        print(f"window rung: {rung or DS._worst_span(L)} bytes "
              f"(worst {DS._worst_span(L)})", flush=True)

        def phase1(s):
            E = DS._walker_table_pallas(s, P, nbits, L, rung)
            return s + dep(E).astype(s.dtype)
        print(f"phase1 walker kernel     "
              f"{marginal(phase1, arr_d) * 1e3:8.2f} ms", flush=True)

        E0 = jnp.asarray(jax.jit(
            lambda s: DS._walker_table_pallas(s, P, nbits, L, rung))(arr_d))
        ERR = jnp.int32(P + 1)
        Efull = jnp.concatenate([E0, jnp.full(2, P + 1, jnp.int32)])

        def phase23(e):
            st, ok = DS._orbit_starts(e, jnp.int32(n), nb, ERR)
            return e + dep(st) + jnp.where(ok, 0, 0)
        print(f"phase2+3 orbit join      "
              f"{marginal(phase23, Efull) * 1e3:8.2f} ms", flush=True)

        def full(s):
            st, ok = DS.scan_table_and_starts(s, jnp.int32(n), nb, L,
                                              span_cap=rung)
            return s + (dep(st) + jnp.where(ok, 0, 1)).astype(s.dtype)
        print(f"full device scan         "
              f"{marginal(full, arr_d) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
