"""On-chip probe: decode word-table build + row-gather alternatives.

probe_dec2 split the 1.9 ms entropy decode: word table 0.75 ms, row gather
0.56 ms, kernel 0.31-0.44 ms.  The table is a 1.3 MB byte->word bitcast that
should cost ~10 us at HBM bandwidth, and the gather pays ~N * W/G indices.
Variants measured here:

  table: (a) bitcast+byteswap (current), (b) bitcast only, (c) strided
         slices, (d) u8 pad only (floor), (e) host-precomputed words (zero)
  gather: (a) G=4 groups, 4 idx/block (current), (b) (m, G) table, 2 row
          fetches per block at G=16, (c) overlapping (m, 2G) rows, ONE
          fetch per block at G=16
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

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    L = cfg.dct_size ** 2
    enc = band_ops.make_encode(key, dt.name, pal)
    levels = np.asarray(jax.jit(jax.vmap(enc))(jax.device_put(planes))
                        ).reshape(-1, L)
    stream = entropy.encode_levels(levels)
    starts = entropy.scan_offsets(stream, levels.shape[0], L)
    max_bb = DC.max_block_bytes_of(starts, len(stream))
    W = DC.words_per_block(L, max_bb)
    n = levels.shape[0]
    nbytes = len(stream)
    print(f"blocks={n} stream={nbytes} max_bb={max_bb} W={W} "
          f"chains={K1}->{K2}", flush=True)

    stream_d = jax.device_put(np.frombuffer(stream, np.uint8))

    def tm(name, s):
        print(f"{name:34s} {s * 1e6:9.1f} us", flush=True)

    # ---- word-table variants -------------------------------------------
    G0 = PK.DEC_GROUP
    gb0 = 4 * G0
    n_groups0 = W // G0
    padded = (-(-nbytes // gb0) + n_groups0) * gb0

    def t_current(s):
        return s + dep(DC._bytes_to_be_words(s, padded)).astype(jnp.uint8)
    tm("table bitcast+swap (current)", marginal(t_current, stream_d))

    def t_bitcast(s):
        b = jnp.concatenate([s, jnp.zeros(padded - nbytes, jnp.uint8)])
        x = jax.lax.bitcast_convert_type(b.reshape(-1, 4), jnp.uint32)
        return s + dep(x.astype(jnp.int32)).astype(jnp.uint8)
    tm("table bitcast only", marginal(t_bitcast, stream_d))

    # swap alone, on a premade word array
    w_le = jnp.asarray(np.frombuffer(
        stream + b"\0" * (padded - nbytes), "<u4").astype(np.uint32))

    def t_swap(x):
        y = ((x << 24) | ((x & 0xFF00) << 8) | ((x >> 8) & 0xFF00)
             | (x >> 24))
        return x + dep(y.astype(jnp.int32)).astype(jnp.uint32)
    tm("byteswap only (on words)", marginal(t_swap, w_le))

    def t_strided(s):
        b = jnp.concatenate([s, jnp.zeros(padded - nbytes, jnp.uint8)]
                            ).astype(jnp.int32)
        x = (b[0::4] << 24) | (b[1::4] << 16) | (b[2::4] << 8) | b[3::4]
        return s + dep(x).astype(jnp.uint8)
    tm("table strided slices", marginal(t_strided, stream_d))

    # host precomputed BE words (device table cost = 0 by construction)
    w_be = np.frombuffer(stream + b"\0" * (padded - nbytes),
                         ">u4").astype(np.int32)
    t0 = time.perf_counter()
    for _ in range(20):
        w_be = np.frombuffer(stream + b"\0" * (padded - nbytes),
                             ">u4").astype(np.int32)
    tm("host be-words build (np)", (time.perf_counter() - t0) / 20)
    wbe_d = jax.device_put(w_be)

    # ---- gather variants ------------------------------------------------
    tblg0 = wbe_d.reshape(-1, G0)
    s32 = jax.device_put(starts.astype(np.int32))

    def g_current(st):
        g0 = st // gb0
        idx = g0[:, None] + jnp.arange(n_groups0, dtype=jnp.int32)[None, :]
        rows = tblg0[idx].reshape(n, n_groups0 * G0)
        return st + dep(rows)
    tm(f"gather G={G0} {n_groups0} idx/blk (current)",
       marginal(g_current, s32))

    for G in (8, 16, 32):
        gb = 4 * G
        padG = (-(-nbytes // gb) + 2) * gb
        wbe2 = np.frombuffer(stream + b"\0" * (padG - nbytes),
                             ">u4").astype(np.int32)
        tbl = jax.device_put(wbe2).reshape(-1, G)

        def g_two(st, tbl=tbl, gb=gb, G=G):
            g0 = st // gb
            idx = g0[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
            rows = tbl[idx].reshape(n, 2 * G)
            return st + dep(rows)
        tm(f"gather (m,{G}) 2 idx/blk", marginal(g_two, s32))

        tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)

        def g_one(st, tbl_ov=tbl_ov, gb=gb):
            g0 = st // gb
            rows = tbl_ov[g0]
            return st + dep(rows)
        tm(f"gather overlap (m,{2 * G}) 1 idx/blk", marginal(g_one, s32))

        def g_build_ov(x, G=G):
            t = x.reshape(-1, G)
            ov = jnp.concatenate([t[:-1], t[1:]], axis=1)
            return x + dep(ov)
        tm(f"  overlap table build G={G}", marginal(g_build_ov,
                                                    jax.device_put(wbe2)))


if __name__ == "__main__":
    main()
