"""On-chip probe: sized entropy-encode decomposition + natural-layout
lv kernel (the decode treatment applied to the encode side).

r4 profile: entropy_enc_sized = 1.15 ms at 4.2 MP vs entropy_dec 0.60 and
fused_dec 1.31 — the slowest production stage.  The decode side won twice
by moving XLA-side relayouts INTO the Mosaic kernel (natural in/out
layout, transpose in VMEM: 0.92 -> 0.64 ms, probe_dec4).  The encode path
still pays two XLA relayouts around its kernel:

  * ``levels.T``: (N, L) -> (L, N) int32, ~12.6 MB at 4.2 MP, feeding the
    (L, ENC_TILE) input blocks;
  * ``rows.T``:   (W, N) -> (N, W) on the output (~2 MB at W=10).

Variants measured (marginal, in-program dependent chains):

  enc_sized_now    current encode_rows (lv kernel) + compact_rows
  lvT_alone        the levels.T relayout by itself
  rows_now         encode_rows alone (kernel + both relayouts)
  rows_nat         natural-layout kernel variant: (TILE, L) in,
                   (TILE, W) out, transposes in VMEM
  enc_sized_nat    rows_nat + compact_rows
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.ops import pallas_kernels as PK  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "2"))
K2 = int(os.environ.get("CHAIN_K2", "10"))

import itertools  # noqa: E402

_salt_counter = itertools.count(1)


def _salt():
    return jax.device_put(np.int32(next(_salt_counter)))


def _wall_best(fn, *args, reps: int = 5) -> float:
    jax.block_until_ready(fn(*args, _salt()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, _salt()))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(body, init) -> float:
    def chain(k):
        return jax.jit(lambda x, s: (
            jax.lax.fori_loop(0, k, lambda i, c: body(c), x), s))
    t1 = _wall_best(chain(K1), init)
    t2 = _wall_best(chain(K2), init)
    return max(0.0, (t2 - t1) / (K2 - K1))


def dep(x):
    x = jax.lax.optimization_barrier(x)
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


# --- natural-layout lv encode kernel variant -------------------------------

def _lv_kernel_nat(lv_ref, out_ref, bb_ref, *, L: int, W: int):
    """_encode_stream_lv_kernel with NATURAL in/out layout: the (T, L)
    levels block and (T, W) rows output transpose inside VMEM."""
    lvT = jnp.transpose(lv_ref[:], (1, 0))        # (L, T) in VMEM
    T = lvT.shape[1]
    z = jnp.zeros((1, T), jnp.uint32)
    words = jnp.zeros((W, T), jnp.uint32)
    total = jnp.zeros((1, T), jnp.int32)
    prev = jnp.full((1, T), -1, jnp.int32)
    n_sub = max(0, -(-((L - 1) // 15 - 4) // 4)) if L > 75 else 0
    for s in range(L):
        lv = lvT[s:s + 1, :]
        nz = lv != 0
        absamp = jnp.abs(lv)
        fb = jax.lax.bitcast_convert_type(
            (absamp | 1).astype(jnp.float32), jnp.uint32)
        size = (fb >> 23).astype(jnp.int32) - 125
        size = jnp.where(size > 15, 15, size)
        run = s - prev - 1
        nchains = (run * 2185) >> 15
        rrem = run - nchains * 15
        for j in range(n_sub):
            over = jnp.clip(nchains - 4 - 4 * j, 0, 4)
            k8o = (8 * over).astype(jnp.uint32)
            pko = jnp.where(
                over > 0,
                jnp.uint32(0xF0F0F0F0)
                >> ((jnp.uint32(32) - k8o) & jnp.uint32(31)), 0)
            co = jnp.where(nz, 8 * over, 0)
            total = total + co
            words = PK._append_group(words, co, z, jnp.where(nz, pko, 0), W)
        nch = jnp.minimum(nchains, 4) if n_sub else nchains
        sign = (lv > 0).astype(jnp.int32)
        code = ((rrem << (4 + size)) | (size << size)
                | (sign << (size - 1)) | absamp).astype(jnp.uint32)
        k8 = (8 * nch).astype(jnp.uint32)
        pk = jnp.where(
            nch > 0,
            jnp.uint32(0xF0F0F0F0) >> ((jnp.uint32(32) - k8)
                                       & jnp.uint32(31)), 0)
        sb = (8 + size).astype(jnp.uint32)
        lo = jnp.where(nz, (pk << sb) | code, 0)
        hi = jnp.where(nz, pk >> (jnp.uint32(32) - sb), 0)
        c = jnp.where(nz, 8 * nch + 8 + size, 0)
        prev = jnp.where(nz, s, prev)
        total = total + c
        words = PK._append_group(words, c, hi, lo, W)
    pad = (-(total + 8)) & 7
    c_eob = 8 + pad
    total = total + c_eob
    words = PK._append_group(words, c_eob, z, z, W)
    rows = PK._top_justify(words, total, W).astype(jnp.int32)
    out_ref[:] = jnp.transpose(rows, (1, 0))      # (T, W) natural
    bb_ref[:] = jnp.transpose(total >> 3, (1, 0))


def encode_rows_nat(levels, W: int, tile: int = 1024, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, L = levels.shape
    grid = pl.cdiv(n, tile)
    npad = grid * tile
    if npad != n:
        levels = jnp.concatenate(
            [levels, jnp.zeros((npad - n, L), jnp.int32)], axis=0)
    kern = functools.partial(_lv_kernel_nat, L=L, W=W)
    rows, bb = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad, W), jnp.int32),
                   jax.ShapeDtypeStruct((npad, 1), jnp.int32)],
        interpret=interpret,
    )(levels)
    return rows[:n], bb[:n, 0]


def main() -> None:
    h = w = int(os.environ.get("PROBE_HW", "2048"))
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 30 * np.sin((yx[0] + yx[1]) / 9.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    planes = np.repeat(plane[None, :, :], 3, 0).astype(np.uint8)

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    L = cfg.dct_size ** 2
    enc = band_ops.make_encode_batch(key, dt.name, pal)
    pl_d = jax.device_put(planes)
    levels = np.asarray(jax.jit(enc)(pl_d)).reshape(-1, L)
    lv_d = jax.device_put(levels)
    stream = entropy.encode_levels(levels)

    bb_np = np.asarray(jax.jit(DC.block_bytes_of)(lv_d))
    W = DC.encode_words_bucket(L, int(bb_np.max()))
    cap = DC.encode_cap_bucket(int(bb_np.sum()),
                               levels.shape[0] * DC.worst_case_block_bytes(L))
    mu = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb_np)))
    G = DC.gather_group_bucket(mu, levels.shape[0], W)
    print(f"backend={jax.default_backend()} n={levels.shape[0]} W={W} "
          f"cap={cap} G={G} chain {K1}->{K2}", file=sys.stderr)

    # correctness: natural-layout kernel == current kernel == host stream
    r_now, bb_now = jax.jit(
        lambda lv: PK.encode_stream_rows_lv(lv, W))(lv_d)
    r_nat, bb_nat = jax.jit(
        lambda lv: encode_rows_nat(lv, W))(lv_d)
    assert np.array_equal(np.asarray(bb_now), bb_np)
    assert np.array_equal(np.asarray(bb_nat), bb_np), "nat bb mismatch"
    assert np.array_equal(np.asarray(r_now), np.asarray(r_nat)), \
        "nat rows mismatch"
    got = np.asarray(jax.jit(
        lambda lv: DC.compact_rows(*encode_rows_nat(lv, W), L, cap, G))(lv_d))
    assert got[:len(stream)].tobytes() == stream, "nat sized stream mismatch"
    print("correctness OK", file=sys.stderr)

    def run(name, t):
        print(f"{name:18s} {t * 1e3:8.3f} ms", file=sys.stderr)

    def enc_sized_now(lv):
        buf, b, _bad = DC.encode_stream_sized(lv, W, cap, G)
        return lv + dep(buf) + dep(b)

    run("enc_sized_now", marginal(enc_sized_now, lv_d))

    def lvT_alone(lv):
        t = jnp.transpose(lv, (1, 0))
        return lv + dep(t)

    run("lvT_alone", marginal(lvT_alone, lv_d))

    def rows_now(lv):
        r, b = PK.encode_stream_rows_lv(lv, W)
        return lv + dep(r) + dep(b)

    run("rows_now", marginal(rows_now, lv_d))

    def rows_nat(lv):
        r, b = encode_rows_nat(lv, W)
        return lv + dep(r) + dep(b)

    run("rows_nat", marginal(rows_nat, lv_d))

    def enc_sized_nat(lv):
        r, b = encode_rows_nat(lv, W)
        buf = DC.compact_rows(r, b, L, cap, G)
        return lv + dep(buf) + dep(b)

    run("enc_sized_nat", marginal(enc_sized_nat, lv_d))

    # compaction alone (shared by both variants)
    r_d = jax.device_put(np.asarray(r_now))
    bb_d = jax.device_put(bb_np)

    def compact_only(r):
        buf = DC.compact_rows(r, bb_d, L, cap, G)
        return r + dep(buf)

    run("compact_only", marginal(compact_only, r_d))


if __name__ == "__main__":
    main()
