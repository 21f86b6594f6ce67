"""On-chip probe: content-sized two-phase entropy encode vs worst-case.

Measures at 4.2 MP (a) the unsized funnel+compaction path, (b) the sized
phase-2 program at the real buckets, for MERGE_DEPTH/GATHER_G candidates.
Phase 1 (coeff + stats) is measured once — identical across variants.
Every variant is checked bit-exact against the host codec before timing.
"""
from __future__ import annotations

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

K1, K2 = 2, 10


def _wall_best(fn, *args, reps: int = 7) -> float:
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
    want = entropy.encode_levels(levels)
    lv_d = jax.device_put(levels)
    n = levels.shape[0]

    bb = np.asarray(jax.jit(DC.block_bytes_of)(lv_d))
    max_bb, total = int(bb.max()), int(bb.sum())
    W = DC.encode_words_bucket(L, max_bb)
    cap = DC.encode_cap_bucket(total, n * DC.worst_case_block_bytes(L))
    print(f"blocks={n} stream={total} worst={n * DC.worst_case_block_bytes(L)}"
          f" max_bb={max_bb} W={W} (full {DC.encode_words_full(L)})"
          f" cap={cap}", flush=True)

    # phase 1: coeff encode + stats (shared by all variants)
    def phase1(x):
        lv = jax.vmap(enc)(x).reshape(-1, L)
        b = DC.block_bytes_of(lv)
        # dep() reduces over every output (DCE guard); max/sum are the
        # actual stats reductions and are <= dep's cost, so dep(b) covers
        # them.  Carry must keep x's type for the fori_loop chain.
        return x + dep(lv) + dep(b)
    x_d = jax.device_put(planes)
    s = marginal(phase1, x_d.astype(jnp.int32))
    print(f"phase1 coeff+stats      {s * 1e3:7.2f} ms {mp / s:8.1f} MP/s",
          flush=True)

    for m, G in [(6, 16), (9, 128)] * 2:
        DC.MERGE_DEPTH, DC.GATHER_G = m, G
        for label, Wv, capv in [("worst", 0, 0), ("sized", W, cap)]:
            def full(lv, Wv=Wv, capv=capv):
                rows, b = DC.encode_rows(lv, W=Wv)
                return lv + dep(DC.compact_rows(rows, b, L, capv)) + dep(b)

            got = np.asarray(jax.jit(
                lambda lv, Wv=Wv, capv=capv: DC.compact_rows(
                    *DC.encode_rows(lv, W=Wv), L, capv))(lv_d))
            ok = (got[:total].tobytes() == want and not got[total:].any())
            s = marginal(full, lv_d)
            mps = f"{mp / s:8.1f} MP/s" if s > 0 else " (<noise)"
            print(f"m={m} G={G:3d} {label}  "
                  f"{'bit-exact' if ok else 'MISMATCH '}"
                  f"  {s * 1e3:7.2f} ms {mps}", flush=True)
    DC.MERGE_DEPTH, DC.GATHER_G = 6, 16


if __name__ == "__main__":
    main()
