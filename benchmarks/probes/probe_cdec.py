"""On-chip probe: where do coeff_dec's 2.5 ms go? (post-barrier honest dep)

The first honest r4 capture (after c80f2e0 closed the range-analysis DCE
hole) reads coeff_dec = 2.47-2.60 ms at 4.2 MP (qtable/8/bs2, combined
operator path) — vs coeff_enc at 0.11-0.25 ms.  The path is:
decode_blocks Mosaic matmul (N, 128)@(128, 512) -> (N*pack, 256) pixels
-> reshape (nv, nh, 16, 16) -> deblockify transpose(0,2,1,3) -> plane.

Suspect: the deblockify transpose interleaves 16-wide chunks on the minor
axis — the same 2-D-strided relayout family as the 47 ms subsample bug
(commit 4f19b0f).  A/B candidates:
  B. row-interleave: D middle-axis slices pix[:, :, pr, :] (contiguous
     inner rows) stacked on a new axis -> (nv, D, nh*D): the relayout
     moves whole contiguous 8 KB rows instead of 64 B chunks.
  C. pr-major matmuls: D column-slices of the operator, each (N, L)@(L, D)
     -> stack -> same row-granular interleave, no (N, 256) intermediate.
"""
from __future__ import annotations

import itertools
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
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.ops import blocks as B  # noqa: E402
from jpeg_tpu.ops import pallas_kernels as PK  # noqa: E402
from jpeg_tpu.ops import quantize as Q  # noqa: E402
from jpeg_tpu.ops import transform as T  # noqa: E402

K1 = int(os.environ.get("CHAIN_K1", "4"))
K2 = int(os.environ.get("CHAIN_K2", "36"))

_salt_counter = itertools.count(1)


def _salt():
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
    x = jax.lax.optimization_barrier(x)
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


def main() -> None:
    h = w = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    bs, d = 2, 8
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 30 * np.sin((yx[0] + yx[1]) / 9.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    img = np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8)
    planes = np.ascontiguousarray(img.transpose(2, 0, 1))

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    nv, nh = cfg.blocks_high, cfg.blocks_wide
    nb, L = cfg.num_blocks, d * d
    D = d * bs
    mp = h * w / 1e6
    print(f"backend={jax.default_backend()} {h}x{w} nv={nv} nh={nh} "
          f"L={L} D={D} chain {K1}->{K2}", file=sys.stderr)

    enc = band_ops.make_encode_batch(key, dt.name, pal)
    dec = band_ops.make_decode(key, dt.name, pal)
    lv = np.asarray(jax.jit(enc)(jnp.asarray(planes)))
    lv_d = jax.device_put(jnp.asarray(lv))          # (3, nb, L) int32
    planes_ref = np.asarray(jax.jit(jax.vmap(dec))(lv_d))

    # ---- production full coeff_dec -----------------------------------
    def full(x):
        p = jax.vmap(dec)(x)
        return x + dep(p)

    t_full = marginal(full, lv_d)
    print(f"full coeff_dec     {t_full * 1e3:8.3f} ms "
          f"({mp / t_full:,.0f} MP/s)", file=sys.stderr)

    # ---- pieces of the combined path ----------------------------------
    method = QuantizationMethod("qtable")
    deq_v = Q.dequant_int_vector(method, d)
    dec2 = T.combined_decode_operator(d, bs, "DCT")      # (D*D, L)
    pack = PK.pack_factor(L)
    w_t = jnp.asarray(np.kron(np.eye(pack), dec2.T), jnp.float32)
    deq_t = jnp.asarray(np.tile(deq_v, pack), jnp.int32)
    n_grp = 3 * nb // pack
    lv_flat = jax.device_put(jnp.asarray(lv.reshape(n_grp, pack * L)))

    def kern_only(x):
        pix = PK.decode_blocks(x, w_t, deq_t)
        return x + dep(pix)

    t_k = marginal(kern_only, lv_flat)
    print(f"kernel only        {t_k * 1e3:8.3f} ms", file=sys.stderr)

    # current deblockify (transpose)
    def debl_cur(pix):
        pix = pix.reshape(3, nv, nh, D, D)
        return jax.vmap(B.deblockify)(pix)

    pix_d = jax.device_put(jax.jit(
        lambda x: PK.decode_blocks(x, w_t, deq_t).reshape(3 * nb, D * D)
    )(lv_flat))
    got = np.asarray(jax.jit(debl_cur)(pix_d))
    assert np.array_equal(got, planes_ref), "debl_cur mismatch"

    def debl_cur_dep(pix):
        return pix + dep(debl_cur(pix))

    t_dc = marginal(debl_cur_dep, pix_d)
    print(f"deblockify (transpose) {t_dc * 1e3:8.3f} ms", file=sys.stderr)

    # B: row-granular interleave
    def debl_rows(pix):
        pix = pix.reshape(3, nv, nh, D, D)
        rows = [pix[:, :, :, pr, :].reshape(3, nv, nh * D)
                for pr in range(D)]
        return jnp.stack(rows, axis=2).reshape(3, nv * D, nh * D)

    got = np.asarray(jax.jit(debl_rows)(pix_d))
    assert np.array_equal(got, planes_ref), "debl_rows mismatch"

    def debl_rows_dep(pix):
        return pix + dep(debl_rows(pix))

    t_dr = marginal(debl_rows_dep, pix_d)
    print(f"deblockify (row-ilv)   {t_dr * 1e3:8.3f} ms", file=sys.stderr)

    # kernel + row-interleave end-to-end
    def full_rows(x):
        pix = PK.decode_blocks(x, w_t, deq_t).reshape(3 * nb, D * D)
        return x + dep(debl_rows(pix))

    got = np.asarray(jax.jit(
        lambda x: debl_rows(PK.decode_blocks(x, w_t, deq_t)
                            .reshape(3 * nb, D * D)))(lv_flat))
    assert np.array_equal(got, planes_ref), "full_rows mismatch"
    t_fr = marginal(full_rows, lv_flat)
    print(f"kernel+row-ilv     {t_fr * 1e3:8.3f} ms  vs full "
          f"{t_full * 1e3:.3f}", file=sys.stderr)

    # C: pr-major matmuls straight to row groups (no (N, 256) intermediate)
    # w_t columns for pixel-row pr of the superblock: m = D*pr + pc.
    def full_prmm(x):
        outs = []
        for pr in range(D):
            cols = np.concatenate([np.arange(p * D * D + pr * D,
                                             p * D * D + pr * D + D)
                                   for p in range(pack)])
            wpr = w_t[:, cols]                        # (pack*L, pack*D)
            dpr = PK.decode_blocks(x, wpr, deq_t)     # (n_grp, pack*D)
            outs.append(dpr.reshape(3, nv, nh * D))
        return jnp.stack(outs, axis=2).reshape(3, nv * D, nh * D)

    got = np.asarray(jax.jit(full_prmm)(lv_flat))
    assert np.array_equal(got, planes_ref), "full_prmm mismatch"

    def full_prmm_dep(x):
        return x + dep(full_prmm(x))

    t_pm = marginal(full_prmm_dep, lv_flat)
    print(f"pr-major matmuls   {t_pm * 1e3:8.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
