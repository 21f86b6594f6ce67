"""On-chip probe: deep-chain split of the SIZED entropy encode, and the
row-width (W) sensitivity.

Round-3 follow-up to probe_sized2: shallow (2->10) chains showed +-50%
variance on sub-ms stages, so this probe defaults to 4->36 (CHAIN_K1/K2
env-tunable) and answers two questions:
  * where does the ~1.1 ms sized entropy encode go — lv kernel, merge
    kernel, or compaction gather?
  * the bucketed row width is a multiple of 8 words (64 B) while typical
    photographic max blocks are ~40 B: does a finer bucket (even words,
    e.g. W=10) cut the merge kernel's per-append funnel work by the same
    ~37% the padding suggests?  (Constraint: the merge kernel needs
    2**depth * W % 128 == 0 — any even W with depth >= 6 satisfies it.)
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
    want = entropy.encode_levels(levels)
    lv_d = jax.device_put(levels)
    n = levels.shape[0]

    bb = np.asarray(jax.jit(DC.block_bytes_of)(lv_d))
    max_bb, total = int(bb.max()), int(bb.sum())
    W8 = DC.encode_words_bucket(L, max_bb)
    Wn = -(-max_bb // 4)
    Wn += Wn & 1                                  # even words
    cap = DC.encode_cap_bucket(total, n * DC.worst_case_block_bytes(L))
    m = DC.MERGE_DEPTH
    print(f"blocks={n} stream={total} max_bb={max_bb} W8={W8} Wn={Wn} "
          f"cap={cap} m={m} G={DC.GATHER_G} chains={K1}->{K2}", flush=True)

    def tm(name, s):
        mps = f"{mp / s:8.1f} MP/s" if s > 0 else " (<noise)"
        print(f"{name:24s} {s * 1e3:7.2f} ms {mps}", flush=True)

    for W in () if os.environ.get("SKIP_W") else (W8, Wn):
        # rows: lv kernel alone
        def rows_lv(lv):
            rows, b = PK.encode_stream_rows_lv(lv, W)
            return lv + dep(rows) + dep(b)
        tm(f"rows(lv) W={W}", marginal(rows_lv, lv_d))

        rows0, bb0 = jax.jit(lambda lv: DC.encode_rows(lv, W=W))(lv_d)
        rows0, bb0 = jnp.asarray(rows0), jnp.asarray(bb0)
        u = 1 << m
        n_pad = -(-n // u) * u
        rows_p = jnp.concatenate(
            [rows0, jnp.zeros((n_pad - n, W), rows0.dtype)], axis=0)
        bb_p = jnp.concatenate([bb0, jnp.zeros(n_pad - n, bb0.dtype)])

        def merge_k(r):
            units, ulen = DC._merge_rows_device(r, bb_p, m)
            return r + dep(units) + dep(ulen)
        tm(f"merge_kernel W={W}", marginal(merge_k, rows_p))

        def compact(r):
            return r + dep(DC.compact_rows(r, bb0, L, cap))
        tm(f"compact_full W={W}", marginal(compact, rows0))

        def full(lv):
            buf, b, _bad = DC.encode_stream_sized(lv, W, cap)
            return lv + dep(buf) + dep(b)
        got = np.asarray(jax.jit(
            lambda lv: DC.encode_stream_sized(lv, W, cap)[0])(lv_d))
        ok = got[:total].tobytes() == want and not got[total:].any()
        tm(f"full_sized W={W} {'ok' if ok else 'MISMATCH'}",
           marginal(full, lv_d))

    # Merge-depth sweep with the content-adaptive gather group: shallower
    # merges skip the most expensive ladder rounds; the bigger G the long
    # photographic units allow keeps the gather index count low anyway.
    W = Wn
    for mm in (6, 7, 8, 9, 10):
        DC.MERGE_DEPTH = mm
        mu = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb)))
        G = DC.gather_group_bucket(mu, n, W)

        def fullg(lv):
            buf, b, _bad = DC.encode_stream_sized(lv, W, cap, G)
            return lv + dep(buf) + dep(b)
        got = np.asarray(jax.jit(
            lambda lv: DC.encode_stream_sized(lv, W, cap, G)[0])(lv_d))
        ok = got[:total].tobytes() == want and not got[total:].any()
        tm(f"full m={mm} G={G} {'ok' if ok else 'MISMATCH'}",
           marginal(fullg, lv_d))
    DC.MERGE_DEPTH = m


if __name__ == "__main__":
    main()
