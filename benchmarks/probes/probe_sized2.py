"""On-chip probe: entropy-encode sub-stage breakdown at SIZED shapes.

Where do the ~1.5-2.2 ms of the content-sized entropy encode go?  Measures
marginal costs (in-program dependent chains) of: the unit-group tables
(pure XLA scans), the Mosaic funnel kernel alone, rows = tables + kernel,
the compaction gather alone, and the full sized encode, at the real
bucketed W/cap for a 4.2 MP natural image.
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
from jpeg_tpu.ops import pallas_kernels as PK  # noqa: E402

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
    print(f"blocks={n} stream={total} max_bb={max_bb} W={W} cap={cap} "
          f"m={DC.MERGE_DEPTH} G={DC.GATHER_G}", flush=True)

    def tm(name, s):
        mps = f"{mp / s:8.1f} MP/s" if s > 0 else " (<noise)"
        print(f"{name:18s} {s * 1e3:7.2f} ms {mps}", flush=True)

    # (a) unit-group tables alone (pure XLA)
    def groups(lv):
        cb, vh, vl, b = DC._unit_groups(lv)
        return lv + dep(cb) + dep(vh) + dep(vl) + dep(b)
    tm("unit_groups", marginal(groups, lv_d))

    # (b) funnel kernel alone, tables precomputed
    cb0, vh0, vl0, b0 = jax.jit(DC._unit_groups)(lv_d)
    cb0, vh0, vl0 = map(jnp.asarray, (cb0, vh0, vl0))

    def kernel(cb):
        rows = PK.encode_stream_rows(cb, vh0, vl0, W)
        return cb + dep(rows)
    tm("funnel_kernel", marginal(kernel, cb0))

    # (c) rows two ways: XLA tables + kernel, vs in-kernel unit groups
    def rows_tables(lv):
        cb, vh, vl, b = DC._unit_groups(lv)
        rows = PK.encode_stream_rows(cb, vh, vl, W)
        return lv + dep(rows) + dep(b)
    tm("rows(tables)", marginal(rows_tables, lv_d))

    def rows_lv(lv):
        rows, b = PK.encode_stream_rows_lv(lv, W)
        return lv + dep(rows) + dep(b)
    got_r, got_b = jax.jit(lambda lv: PK.encode_stream_rows_lv(lv, W))(lv_d)
    want_r = jax.jit(lambda lv: PK.encode_stream_rows(
        *DC._unit_groups(lv)[:3], W))(lv_d)
    assert np.array_equal(np.asarray(got_r), np.asarray(want_r))
    tm("rows(lv)", marginal(rows_lv, lv_d))

    # (d) compaction alone, rows precomputed
    rows0, bb0 = jax.jit(lambda lv: DC.encode_rows(lv, W=W))(lv_d)
    rows0, bb0 = jnp.asarray(rows0), jnp.asarray(bb0)

    def compact(r):
        return r + dep(DC.compact_rows(r, bb0, L, cap))
    tm("compaction", marginal(compact, rows0))

    # (d') merge rounds alone (pad to the unit multiple like compact_rows)
    m = DC.MERGE_DEPTH
    u = 1 << m
    n_pad = -(-n // u) * u
    rows_p = jnp.concatenate(
        [rows0, jnp.zeros((n_pad - n, W), rows0.dtype)], axis=0)
    bb_p = jnp.concatenate([bb0, jnp.zeros(n_pad - n, bb0.dtype)])

    def merge(r):
        units, ulen = DC._merge_rows(r, bb_p, m)
        return r + dep(units) + dep(ulen)
    tm("merge_rounds", marginal(merge, rows_p))

    # (d'') Mosaic merge kernel (correctness gate, then marginal)
    wu, wl = jax.jit(lambda r: DC._merge_rows(r, bb_p, m))(rows_p)
    gu, gl = jax.jit(lambda r: DC._merge_rows_device(r, bb_p, m))(rows_p)
    assert np.array_equal(np.asarray(wu), np.asarray(gu))
    assert np.array_equal(np.asarray(wl), np.asarray(gl))

    def merge_k(r):
        units, ulen = DC._merge_rows_device(r, bb_p, m)
        return r + dep(units) + dep(ulen)
    tm("merge_kernel", marginal(merge_k, rows_p))

    # (e) full sized encode, sweeping merge depth x gather group (the
    # kernel merge made deeper merges nearly free; bigger groups cut the
    # gather index count further)
    for mm, GG in [(9, 128), (10, 256), (11, 512)]:
        DC.MERGE_DEPTH, DC.GATHER_G = mm, GG

        def full(lv):
            buf, b, _bad = DC.encode_stream_sized(lv, W, cap)
            return lv + dep(buf) + dep(b)
        got = np.asarray(jax.jit(
            lambda lv: DC.encode_stream_sized(lv, W, cap)[0])(lv_d))
        ok = got[:total].tobytes() == want and not got[total:].any()
        tm(f"full_sized m={mm} G={GG} {'ok' if ok else 'MISMATCH'}",
           marginal(full, lv_d))
    DC.MERGE_DEPTH, DC.GATHER_G = 9, 128


if __name__ == "__main__":
    main()
