"""On-chip probe: where do the NON-kernel 0.5 ms of entropy decode go?

r4 profile: entropy_dec = 0.91 ms at 4.2 MP with the production geometry
(G=16, weff=12, sort=False), of which probe_dec3-era measurements put the
Mosaic kernel at ~0.3-0.45 ms.  The remaining path is: 5-op byteswap of the
host LE words -> overlap-table reshape/concat -> ONE row gather per block ->
XLA transpose IN (n, 2G) -> (2G, n) -> kernel -> XLA transpose OUT
(L, npad) -> (npad, L).  This probe measures each piece marginally and A/Bs
an in-kernel-transpose variant (blocks arrive on sublanes, Mosaic transposes
tiles in VMEM) against the XLA-relayout form.
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
from jpeg_tpu.utils.device import pow2_cap  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "4"))
K2 = int(os.environ.get("CHAIN_K2", "36"))


import itertools

_salt_counter = itertools.count(1)


def _salt():
    """Fresh scalar device arg per timed call: the axon proxy dedups
    identical (executable, args) dispatches and can return a cached
    result in ~0.1 ms instead of executing (see probes/README.md)."""
    return jax.device_put(np.int32(next(_salt_counter)))


def _wall_best(fn, *args, reps: int = 3) -> float:
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
    # barrier: stop range analysis folding min(|x|, 0) for provably
    # nonnegative stage outputs (see device_profile.py:dep)
    x = jax.lax.optimization_barrier(x)
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


# ---------------------------------------------------------------------------
# In-kernel-transpose decode variant: same lockstep funnel machinery, but the
# tile arrives (DEC_TILE, W) from HBM (the gather's natural layout) and the
# out block leaves (DEC_TILE, L); Mosaic transposes both inside VMEM.
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return jax.default_backend() != "tpu"


def make_ktr(L, W, G, WE):
    T = PK.DEC_TILE

    def kern(words_ref, phase_ref, out_ref):
        # transpose in VMEM: (T, W) -> (W, T), (T, 1) -> (1, T)
        words = jnp.transpose(words_ref[:], (1, 0)).astype(jnp.uint32)
        ph = jnp.transpose(phase_ref[:], (1, 0))
        zrow = jnp.zeros((1, T), jnp.uint32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, T), 0)
        max_steps = L + L // PK.MAX_RUN + 2

        wsh = ph >> 5
        k = 1
        while k < G:
            k <<= 1
        k >>= 1
        while k >= 1:
            shifted = jnp.concatenate(
                [words[k:, :], jnp.zeros((k, T), jnp.uint32)], axis=0)
            take = wsh >= k
            words = jnp.where(take, shifted, words)
            wsh = jnp.where(take, wsh - k, wsh)
            k >>= 1
        b = (ph & 31).astype(jnp.uint32)
        wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
        words = (words << b) | ((wnext >> (jnp.uint32(31) - b)) >> 1)
        words = words[:WE]

        def cond(carry):
            step, _w, _p, _wi, done, _o = carry
            return (step < max_steps) & (jnp.min(done) == 0)

        def decode_one(words, phase, widx, done, out):
            win = words[0:1, :]
            run = (win >> 28).astype(jnp.int32)
            size = ((win >> 24) & 0xF).astype(jnp.int32)
            is_eob = (run == 0) & (size == 0)
            is_chain = (run == PK.MAX_RUN) & (size == 0)
            is_code = ~is_eob & ~is_chain
            sign = ((win >> 23) & 1).astype(jnp.int32)
            nmag = jnp.maximum(size - 1, 0).astype(jnp.uint32)
            mag = ((win >> (jnp.uint32(23) - nmag))
                   & ((jnp.uint32(1) << nmag) - 1)).astype(jnp.int32)
            amp = jnp.where(sign == 1, mag, -mag)
            active = done == 0
            wt = widx + run
            store = active & is_code & (wt < L)
            out = jnp.where(store & (cols == wt), amp, out)
            widx = jnp.where(active & is_chain, widx + PK.MAX_RUN,
                             jnp.where(store, wt + 1, widx))
            adv = jnp.where(is_eob, 8 + ((8 - phase) & 7),
                            jnp.where(is_chain, 8, 8 + size))
            phase = (phase + adv) & 7
            done = jnp.where(active & is_eob, 1, done)
            sh = adv.astype(jnp.uint32)
            wnext = jnp.concatenate([words[1:, :], zrow], axis=0)
            words = (words << sh) | (wnext >> (jnp.uint32(32) - sh))
            return words, phase, widx, done, out

        def body(carry):
            step, words, phase, widx, done, out = carry
            for _ in range(PK.DEC_UNROLL):
                words, phase, widx, done, out = decode_one(
                    words, phase, widx, done, out)
            return step + PK.DEC_UNROLL, words, phase, widx, done, out

        init = (jnp.int32(0), words,
                jnp.zeros((1, T), jnp.int32),
                jnp.zeros((1, T), jnp.int32),
                jnp.zeros((1, T), jnp.int32),
                jnp.zeros((L, T), jnp.int32))
        _, _, _, _, _, out = jax.lax.while_loop(cond, body, init)
        out_ref[:] = jnp.transpose(out, (1, 0))    # (T, L) natural out

    return kern


def decode_rows_ktr(word_rows, phase, L, weff):
    n, W = word_rows.shape
    T = PK.DEC_TILE
    grid = pl.cdiv(n, T)
    npad = grid * T
    if npad != n:
        word_rows = jnp.concatenate(
            [word_rows, jnp.zeros((npad - n, W), word_rows.dtype)], axis=0)
        phase = jnp.concatenate(
            [phase, jnp.zeros((npad - n, 1), phase.dtype)], axis=0)
    kern = make_ktr(L, W, W // 2, weff)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((T, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((T, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, L), jnp.int32),
        interpret=_interp(),
    )(word_rows, phase)
    return out[:n]


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
    levels = np.asarray(jax.jit(enc)(jax.device_put(planes))).reshape(-1, L)
    stream = entropy.encode_levels(levels)
    starts = entropy.scan_offsets(stream, levels.shape[0], L)
    pad = pow2_cap(len(stream))
    arr = np.zeros(pad, np.uint8)
    arr[:len(stream)] = np.frombuffer(stream, np.uint8)
    arr_d = jax.device_put(DC.host_stream_arg(arr))
    st_d = jax.device_put(starts.astype(np.int32))
    total = np.int32(len(stream))
    n = levels.shape[0]

    bucket_bb = DC.bucket_block_bytes(
        L, DC.max_block_bytes_of(starts, len(stream)))
    G = DC.dec_group(L, bucket_bb)
    we = DC.dec_weff(L, bucket_bb, G)
    gb = 4 * G
    nbytes = len(stream)
    srt = DC.sort_pays_off(starts, len(stream))
    print(f"backend={jax.default_backend()} n={n} stream={nbytes} "
          f"G={G} weff={we} sort={srt} chain {K1}->{K2}", file=sys.stderr)

    # ---- full production decode --------------------------------------
    def full(st):
        lv = DC.decode_stream(arr_d, st, L, bucket_bb, sort=srt,
                              total_len=total)
        return st + dep(lv)

    lv_ref = np.asarray(jax.jit(
        lambda s: DC.decode_stream(arr_d, s, L, bucket_bb, sort=srt,
                                   total_len=total))(st_d))
    assert np.array_equal(lv_ref, levels)
    t_full = marginal(full, st_d)
    print(f"full decode        {t_full * 1e3:8.3f} ms", file=sys.stderr)

    # ---- table build + gather, no kernel ------------------------------
    nw = (arr.shape[0] // gb + 2) * G

    def table_gather(st):
        tbl = DC._be_word_table(arr_d, arr.shape[0], nw).reshape(-1, G)
        tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)
        rows = tbl_ov[st // gb]
        ph = ((st % gb) * 8)[:, None]
        return st + dep(rows) + dep(ph)

    t_tg = marginal(table_gather, st_d)
    print(f"table+gather       {t_tg * 1e3:8.3f} ms", file=sys.stderr)

    # table alone
    def table_only(st):
        tbl = DC._be_word_table(arr_d, arr.shape[0], nw).reshape(-1, G)
        tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)
        return st + dep(tbl_ov)

    t_t = marginal(table_only, st_d)
    print(f"table only         {t_t * 1e3:8.3f} ms", file=sys.stderr)

    # ---- precompute rows/phase on device, time kernel+transposes ------
    def mk_rows(st):
        tbl = DC._be_word_table(arr_d, arr.shape[0], nw).reshape(-1, G)
        tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)
        return tbl_ov[st // gb], ((st % gb) * 8)[:, None]

    rows_d, ph_d = jax.jit(mk_rows)(st_d)
    rows_d, ph_d = jax.block_until_ready((rows_d, ph_d))

    def kern_xla_tr(rws):
        lv = PK.decode_stream_rows(rws, ph_d, L, weff=we)
        return rws + dep(lv)

    t_kx = marginal(kern_xla_tr, rows_d)
    print(f"kernel+XLA transp  {t_kx * 1e3:8.3f} ms", file=sys.stderr)

    # kernel on pre-transposed inputs (no XLA relayouts in the chain)
    grid = pl.cdiv(n, PK.DEC_TILE)
    npad = grid * PK.DEC_TILE
    rT = np.zeros((2 * G, npad), np.int32)
    rT[:, :n] = np.asarray(rows_d).T
    pT = np.zeros((1, npad), np.int32)
    pT[:, :n] = np.asarray(ph_d).T
    rT_d = jax.device_put(rT)
    pT_d = jax.device_put(pT)
    kern = functools.partial(PK._decode_stream_kernel, L=L, W=2 * G, G=G,
                             WE=we)

    def kern_only(rt):
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((2 * G, PK.DEC_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, PK.DEC_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((L, PK.DEC_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, npad), jnp.int32),
            interpret=_interp(),
        )(rt, pT_d)
        return rt + dep(out)

    # correctness first
    outT = np.asarray(jax.jit(lambda rt: pl.pallas_call(
        kern, grid=(grid,),
        in_specs=[pl.BlockSpec((2 * G, PK.DEC_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, PK.DEC_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, PK.DEC_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, npad), jnp.int32),
        interpret=_interp())(rt, pT_d)
    )(rT_d))
    assert np.array_equal(outT.T[:n], levels), "kernel-only mismatch"
    t_k = marginal(kern_only, rT_d)
    print(f"kernel only        {t_k * 1e3:8.3f} ms "
          f"(XLA transposes ~ {(t_kx - t_k) * 1e3:.3f})", file=sys.stderr)

    # ---- in-kernel transpose variant ----------------------------------
    got = np.asarray(jax.jit(
        lambda r: decode_rows_ktr(r, ph_d, L, we))(rows_d))
    if np.array_equal(got, levels):
        def kern_ktr(rws):
            lv = decode_rows_ktr(rws, ph_d, L, we)
            return rws + dep(lv)

        t_kt = marginal(kern_ktr, rows_d)
        print(f"kernel in-VMEM tr  {t_kt * 1e3:8.3f} ms", file=sys.stderr)
    else:
        print("kernel in-VMEM tr  WRONG OUTPUT", file=sys.stderr)

    # ---- end-to-end with in-kernel transpose -------------------------
    def full_ktr(st):
        tbl = DC._be_word_table(arr_d, arr.shape[0], nw).reshape(-1, G)
        tbl_ov = jnp.concatenate([tbl[:-1], tbl[1:]], axis=1)
        rows = tbl_ov[st // gb]
        ph = ((st % gb) * 8)[:, None]
        lv = decode_rows_ktr(rows, ph, L, we)
        return st + dep(lv)

    t_fk = marginal(full_ktr, st_d)
    print(f"full (in-VMEM tr)  {t_fk * 1e3:8.3f} ms  vs {t_full * 1e3:.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
