"""On-chip probe: entropy-decode kernel tile-size sweep.

The decode kernel's lockstep while-loop exits when EVERY column in the
tile has hit EOB, so one dense block drags all DEC_TILE-1 neighbours to
its code count.  Smaller tiles bound the straggler radius at the cost of
more grid steps; this probe sweeps DEC_TILE (and DEC_UNROLL) at a 4.2 MP
natural image with deep marginal chains (CHAIN_K1/K2 env).
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

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.ops import pallas_kernels as PK  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "4"))
K2 = int(os.environ.get("CHAIN_K2", "36"))


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
    h = w = 2048
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    planes = np.repeat(plane[None, :, :], 3, 0).astype(np.uint8)
    mp = h * w / 1e6

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    L = cfg.dct_size ** 2
    enc = band_ops.make_encode(key, dt.name, pal)
    levels = np.asarray(jax.jit(jax.vmap(enc))(jax.device_put(planes))
                        ).reshape(-1, L)
    stream = entropy.encode_levels(levels)
    starts = entropy.scan_offsets(stream, levels.shape[0], L)
    max_bb = DC.max_block_bytes_of(starts, len(stream))
    n = levels.shape[0]
    # per-block code counts, for context on the straggler effect
    codes = (levels != 0).sum(axis=1)
    print(f"blocks={n} stream={len(stream)} max_bb={max_bb} "
          f"codes mean={codes.mean():.1f} p99={np.percentile(codes, 99):.0f} "
          f"max={codes.max()} chains={K1}->{K2}", flush=True)

    stream_d = jax.device_put(np.frombuffer(stream, np.uint8))
    starts_d = jax.device_put(starts.astype(np.int32))

    def tm(name, s):
        mps = f"{mp / s:8.1f} MP/s" if s > 0 else " (<noise)"
        print(f"{name:28s} {s * 1e3:7.2f} ms {mps}", flush=True)

    for T, U in [(1024, 2), (512, 2), (256, 2), (1024, 4), (512, 4)]:
        PK.DEC_TILE, PK.DEC_UNROLL = T, U
        got = np.asarray(jax.jit(
            lambda s, st: DC.decode_stream(s, st, L, max_bb))(
                stream_d, starts_d))
        ok = np.array_equal(got, levels)

        def body(s):
            lv = DC.decode_stream(s, starts_d, L, max_bb)
            return s + dep(lv).astype(jnp.uint8)
        tm(f"decode T={T} U={U} {'ok' if ok else 'MISMATCH'}",
           marginal(body, stream_d))
    PK.DEC_TILE, PK.DEC_UNROLL = 1024, 2


if __name__ == "__main__":
    main()
