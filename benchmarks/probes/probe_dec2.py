"""On-chip probe: decode_stream component split.

A VPU op-count model prices the lockstep kernel at ~0.3-0.4 ms for a
4.2 MP band (sorted tiles, ~25 iterations), but the full decode measures
~1.6-2.4 ms — this probe splits the surrounding XLA stages: the in-program
argsort (XLA TPU sorts are notoriously slow), the word-table build, the
grouped row gather, the kernel itself, and the unpermute row gather.
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
    W = DC.words_per_block(L, max_bb)
    n = levels.shape[0]
    print(f"blocks={n} stream={len(stream)} max_bb={max_bb} W={W} "
          f"chains={K1}->{K2}", flush=True)

    stream_d = jax.device_put(np.frombuffer(stream, np.uint8))
    starts_d = jax.device_put(starts.astype(np.int32))
    nbytes = len(stream)

    def tm(name, s):
        mps = f"{mp / s:8.1f} MP/s" if s > 0 else " (<noise)"
        print(f"{name:24s} {s * 1e3:7.2f} ms {mps}", flush=True)

    # (a) argsort of block lengths alone
    def sort_only(s32):
        lens = jnp.diff(s32, append=jnp.int32(nbytes))
        order = jnp.argsort(lens)
        return s32 + dep(order)
    tm("argsort", marginal(sort_only, starts_d))

    # (b) word-table build alone
    G = DC.dec_group(L, max_bb)
    we = DC.dec_weff(L, max_bb, G)
    gb = 4 * G
    nw = (nbytes // gb + 2) * G
    padded = 4 * nw

    def table_old(s):
        p = jnp.concatenate([s.astype(jnp.int32),
                             jnp.zeros(padded - nbytes, jnp.int32)]
                            ).reshape(-1, 4)
        words = (p[:, 0] << 24) | (p[:, 1] << 16) | (p[:, 2] << 8) | p[:, 3]
        return s + dep(words).astype(jnp.uint8)
    tm("word_table(n,4-layout)", marginal(table_old, stream_d))

    def table_only(s):
        return s + dep(DC._bytes_to_be_words(s, padded)).astype(jnp.uint8)
    tm("word_table(bitcast)", marginal(table_only, stream_d))

    # (c) overlap row gather alone (sorted starts precomputed)
    lens_np = np.diff(starts, append=nbytes)
    order_np = np.argsort(lens_np, kind="stable").astype(np.int32)
    s_sorted = jax.device_put(starts.astype(np.int32)[order_np])
    wbe = np.frombuffer(stream + b"\0" * (padded - nbytes),
                        ">u4").astype(np.int32)
    tbl = jnp.asarray(wbe.reshape(-1, G))
    tbl_ov = jnp.asarray(jnp.concatenate([tbl[:-1], tbl[1:]], axis=1))

    def gather_only(s32):
        rows = tbl_ov[s32 // gb]
        return s32 + dep(rows)
    tm("row_gather(1 idx/blk)", marginal(gather_only, s_sorted))

    # (d) kernel alone (sorted rows + phases precomputed)
    rows0 = jnp.asarray(tbl_ov[s_sorted // gb])
    phase0 = jnp.asarray(((s_sorted % gb) * 8)[:, None])

    def kernel_only(r):
        lv = PK.decode_stream_rows(r, phase0, L, weff=we)
        return r + dep(lv)
    tm(f"kernel(sorted,we={we})", marginal(kernel_only, rows0))

    # (d') kernel alone, UNSORTED rows (straggler cost of natural order)
    rowsu = jnp.asarray(tbl_ov[starts_d // gb])
    phaseu = jnp.asarray(((starts_d % gb) * 8)[:, None])

    def kernel_unsorted(r):
        lv = PK.decode_stream_rows(r, phaseu, L, weff=we)
        return r + dep(lv)
    tm("kernel(unsorted)", marginal(kernel_unsorted, rowsu))

    # (e) unpermute row gather alone
    inv_np = np.zeros(n, np.int32)
    inv_np[order_np] = np.arange(n, dtype=np.int32)
    inv_d = jax.device_put(inv_np)
    lv0 = jnp.asarray(jax.jit(
        lambda r: PK.decode_stream_rows(r, phase0, L))(rows0))

    def unpermute(iv):
        return iv + dep(jnp.take(lv0, iv, axis=0))
    tm("unpermute_take", marginal(unpermute, inv_d))

    # (f) full decode_stream, sorted and unsorted layouts.  NOTE a dep()
    # consumer lets XLA fuse the unpermute gather into the reduce (nothing
    # materializes), so also measure with the REAL consumer — the Pallas
    # IDCT kernel, which forces the (N, L) levels to materialize — as in
    # api._decode3_stream_fn.
    dec_band = band_ops.make_decode(key, dt.name, pal)
    from jpeg_tpu.utils.device import pow2_cap
    pad = pow2_cap(nbytes)
    arr = np.zeros(pad, np.uint8)
    arr[:nbytes] = np.frombuffer(stream, np.uint8)
    words_d = jax.device_put(DC.host_stream_arg(arr))
    total = np.int32(nbytes)
    for srt in (True, False):
        def full(s):
            lv = DC.decode_stream(s, starts_d, L, max_bb, sort=srt,
                                  total_len=total)
            return s + dep(lv).astype(s.dtype)
        got = np.asarray(jax.jit(
            lambda s: DC.decode_stream(s, starts_d, L, max_bb, sort=srt,
                                       total_len=total))(words_d))
        ok = np.array_equal(got, levels)
        tm(f"full_decode sort={srt} {'ok' if ok else 'MISMATCH'}",
           marginal(full, words_d))

        def full3(s):
            lv = DC.decode_stream(s, starts_d, L, max_bb, sort=srt,
                                  total_len=total)
            planes = jax.vmap(dec_band)(lv.reshape(3, -1, L))
            return s + dep(planes).astype(s.dtype)
        tm(f"entropy+idct sort={srt}", marginal(full3, words_d))
    print("sort_pays_off:", DC.sort_pays_off(starts, len(stream)),
          flush=True)


if __name__ == "__main__":
    main()
