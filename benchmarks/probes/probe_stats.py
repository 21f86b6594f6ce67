"""On-chip probe: phase-1 stream-geometry stats cost and alternatives.

r4 profile: enc_phase1 = 0.39 ms vs coeff_enc = 0.215 ms at 4.2 MP — the
~0.17 ms delta is block_bytes_of + reductions, whose minimal traffic is one
re-read of the levels (~0.03 ms).  The suspect is the lane-axis
associative_scan (cummax for previous-nonzero) materializing its ladder
through HBM.  Variants:

  v0: current block_bytes_of (lax.associative_scan cummax)
  v1: manual unrolled shifted-max ladder (same math, explicit slices)
  v2: one-pass Pallas stats kernel, natural (TILE, L) layout — emits
      (bb, max|lv|) per block; global reductions stay in XLA on (N,) data
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
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402

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


def bb_manual(levels):
    """block_bytes_of with an explicit shifted-max ladder."""
    L = levels.shape[-1]
    nz = levels != 0
    absamp = jnp.abs(levels)
    fb = jax.lax.bitcast_convert_type(
        (absamp | 1).astype(jnp.float32), jnp.uint32)
    size = jnp.minimum((fb >> 23).astype(jnp.int32) - 125, 15)
    idx = jnp.arange(L, dtype=jnp.int32)
    m = jnp.where(nz, idx, jnp.int32(-1))
    k = 1
    while k < L:
        sh = jnp.concatenate(
            [jnp.full(m.shape[:-1] + (k,), -1, m.dtype), m[..., :-k]],
            axis=-1)
        m = jnp.maximum(m, sh)
        k <<= 1
    prev = jnp.concatenate(
        [jnp.full(m.shape[:-1] + (1,), -1, m.dtype), m[..., :-1]], axis=-1)
    run = idx - prev - 1
    nchains = (run * 2185) >> 15
    gb = jnp.where(nz, 8 * nchains + 8 + size, 0)
    return (jnp.sum(gb, axis=-1) + 8 + 7) >> 3


STAT_TILE = 1024


def _stats_kernel(lv_ref, bb_ref, mx_ref, *, L: int):
    lv = lv_ref[:]                               # (T, L) int32
    T = lv.shape[0]
    nz = lv != 0
    absamp = jnp.abs(lv)
    fb = jax.lax.bitcast_convert_type(
        (absamp | 1).astype(jnp.float32), jnp.uint32)
    size = jnp.minimum((fb >> 23).astype(jnp.int32) - 125, 15)
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
    m = jnp.where(nz, idx, jnp.int32(-1))
    k = 1
    while k < L:
        sh = jnp.concatenate(
            [jnp.full((T, k), -1, m.dtype), m[:, :-k]], axis=1)
        m = jnp.maximum(m, sh)
        k <<= 1
    prev = jnp.concatenate([jnp.full((T, 1), -1, m.dtype), m[:, :-1]],
                           axis=1)
    run = idx - prev - 1
    nchains = (run * 2185) >> 15
    gb = jnp.where(nz, 8 * nchains + 8 + size, 0)
    bb_ref[:] = ((jnp.sum(gb, axis=1, keepdims=True) + 15) >> 3)
    mx_ref[:] = jnp.max(absamp, axis=1, keepdims=True)


def stats_pallas(levels):
    n, L = levels.shape
    grid = pl.cdiv(n, STAT_TILE)
    npad = grid * STAT_TILE
    if npad != n:
        levels = jnp.concatenate(
            [levels, jnp.zeros((npad - n, L), jnp.int32)], axis=0)
    kern = functools.partial(_stats_kernel, L=L)
    bb, mx = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((STAT_TILE, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((STAT_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((STAT_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad, 1), jnp.int32),
                   jax.ShapeDtypeStruct((npad, 1), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(levels)
    return bb[:n, 0], mx[:n, 0]


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
    print(f"backend={jax.default_backend()} n={levels.shape[0]} "
          f"chain {K1}->{K2}", file=sys.stderr)

    # correctness of variants (natural + adversarial random levels)
    bb0 = np.asarray(jax.jit(DC.block_bytes_of)(lv_d))
    assert np.array_equal(np.asarray(jax.jit(bb_manual)(lv_d)), bb0)
    bbp, mxp = jax.jit(stats_pallas)(lv_d)
    assert np.array_equal(np.asarray(bbp), bb0), "pallas stats bb mismatch"
    assert int(np.asarray(mxp).max()) == int(np.abs(levels).max())
    rnd = rng.integers(-16383, 16384, (4096, L)).astype(np.int32)
    rnd[rng.random((4096, L)) < 0.8] = 0
    rnd_d = jax.device_put(rnd)
    assert np.array_equal(
        np.asarray(jax.jit(stats_pallas)(rnd_d)[0]),
        np.asarray(jax.jit(DC.block_bytes_of)(rnd_d)))
    print("correctness OK", file=sys.stderr)

    dtp = planes.dtype

    def enc_only(p):
        lv = enc(p)
        return p + dep(lv).astype(dtp)

    t = marginal(enc_only, pl_d)
    print(f"enc only           {t * 1e3:8.3f} ms", file=sys.stderr)

    def phase1_now(p):
        lv = enc(p).reshape(-1, L)
        b = DC.block_bytes_of(lv)
        st = jnp.stack([jnp.max(b), jnp.sum(b), jnp.max(jnp.abs(lv)),
                        DC.min_unit_bytes_of(b)])
        return p + (dep(lv) + dep(st)).astype(dtp)

    t = marginal(phase1_now, pl_d)
    print(f"phase1 current     {t * 1e3:8.3f} ms", file=sys.stderr)

    def phase1_manual(p):
        lv = enc(p).reshape(-1, L)
        b = bb_manual(lv)
        st = jnp.stack([jnp.max(b), jnp.sum(b), jnp.max(jnp.abs(lv)),
                        DC.min_unit_bytes_of(b)])
        return p + (dep(lv) + dep(st)).astype(dtp)

    t = marginal(phase1_manual, pl_d)
    print(f"phase1 manual      {t * 1e3:8.3f} ms", file=sys.stderr)

    def phase1_pallas(p):
        lv = enc(p).reshape(-1, L)
        b, mx = stats_pallas(lv)
        st = jnp.stack([jnp.max(b), jnp.sum(b), jnp.max(mx),
                        DC.min_unit_bytes_of(b)])
        return p + (dep(lv) + dep(st)).astype(dtp)

    t = marginal(phase1_pallas, pl_d)
    print(f"phase1 pallas      {t * 1e3:8.3f} ms", file=sys.stderr)

    def bb_only_now(lv):
        return lv + dep(DC.block_bytes_of(lv))

    t = marginal(bb_only_now, lv_d)
    print(f"bb alone current   {t * 1e3:8.3f} ms", file=sys.stderr)

    def bb_only_pallas(lv):
        b, mx = stats_pallas(lv)
        return lv + dep(b) + dep(mx)

    t = marginal(bb_only_pallas, lv_d)
    print(f"bb alone pallas    {t * 1e3:8.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
