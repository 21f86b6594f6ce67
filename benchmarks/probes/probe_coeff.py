"""On-chip probe: layout variants for the fused coefficient ENCODE path.

The profile shows coeff_enc ~1.7 ms for 3 bands of a 4.2 MP image while the
Mosaic matmul kernel itself is ~free — the cost is the XLA cast+blockify
relayout feeding it ((H, W) uint8 -> (N, D*D) f32 rows).  Variants:

  a. current         astype(f32) -> blockify -> reshape -> Pallas kernel
  b. blockify-u8     blockify(uint8) -> reshape -> cast -> kernel
                     (relayout moves 4x less data)
  c. xla-einsum      reshape (NV, D, NH, D) -> dot_general contracting
                     (r, c) directly; XLA owns the layout choice, epilogue
                     fused in XLA (no Pallas)
  d. xla-einsum-u8   same but the f32 cast sits INSIDE the contraction
                     operand (XLA reads uint8 from HBM)

Each variant is checked bit-identical to (a) before timing; timing is the
marginal in-program chain method (see device_profile.py).
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
from jpeg_tpu.ops import band as band_ops  # noqa: E402
from jpeg_tpu.ops import blocks as B  # noqa: E402
from jpeg_tpu.ops import pallas_kernels as PK  # noqa: E402
from jpeg_tpu.ops import quantize as Q  # noqa: E402
from jpeg_tpu.ops import transform as T  # noqa: E402

K1, K2 = 2, 10


def _wall_once(fn, *args) -> float:
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


def marginal(body, init) -> float:
    def chain(k):
        return jax.jit(
            lambda x: jax.lax.fori_loop(0, k, lambda i, c: body(c), x))
    t1 = _wall_once(chain(K1), init)
    t2 = _wall_once(chain(K2), init)
    return max(0.0, (t2 - t1) / (K2 - K1))


def dep(x):
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    d, bs = cfg.dct_size, cfg.block_size
    D = d * bs
    L = d * d
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    planes = np.repeat(plane[None, :, :], 3, 0).astype(np.uint8)
    pl_d = jax.device_put(planes)
    mp = h * w / 1e6

    method = cfg.quantization
    op2 = T.combined_encode_operator(d, bs, cfg.transform)     # (L, D*D)
    mul_1, div_1, mask_1 = Q.epilogue_vectors(method, d)
    op_t = jnp.asarray(op2.T, jnp.float32)                     # (D*D, L)
    mulj, divj, maskj = (jnp.asarray(v) for v in (mul_1, div_1, mask_1))

    def enc_a(band):                                 # current production
        blk16 = B.blockify(band.astype(jnp.float32), D)
        vecs = blk16.reshape(-1, D * D)
        return PK.encode_blocks(vecs, op_t, mulj, divj, maskj)

    def enc_b(band):                                 # blockify on uint8
        blk16 = B.blockify(band, D)
        vecs = blk16.reshape(-1, D * D).astype(jnp.float32)
        return PK.encode_blocks(vecs, op_t, mulj, divj, maskj)

    op4 = jnp.asarray(op2.T.reshape(D, D, L), jnp.float32)     # (r, c, L)

    def enc_c(band):                                 # XLA-owned contraction
        x4 = band.astype(jnp.float32).reshape(h // D, D, w // D, D)
        coeffs = jax.lax.dot_general(
            x4, op4, (((1, 3), (0, 1)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)     # (NV, NH, L)
        q = jnp.round(coeffs * mulj / divj) * maskj
        return q.astype(jnp.int32).reshape(-1, L)

    def enc_d(band):                                 # cast inside operand
        x4 = band.reshape(h // D, D, w // D, D)
        coeffs = jax.lax.dot_general(
            x4.astype(jnp.float32), op4, (((1, 3), (0, 1)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        q = jnp.round(coeffs * mulj / divj) * maskj
        return q.astype(jnp.int32).reshape(-1, L)

    variants = {"a_current": enc_a, "b_blockify_u8": enc_b,
                "c_xla_dotgen": enc_c, "d_xla_dotgen_u8": enc_d}

    want = np.asarray(jax.jit(jax.vmap(enc_a))(pl_d))
    for name, f in variants.items():
        got = np.asarray(jax.jit(jax.vmap(f))(pl_d))
        tag = "bit-exact" if np.array_equal(got, want) else "MISMATCH"
        nd = 0 if np.array_equal(got, want) else int(
            (got != want).sum())
        print(f"{name:18s} {tag} ({nd} differing)", flush=True)

    for name, f in variants.items():
        def body(p, f=f):
            lv = jax.vmap(f)(p)
            return p + dep(lv).astype(p.dtype)
        s = marginal(body, pl_d)
        mps = f"{mp / s:9.1f} MP/s" if s > 0 else "(<noise)"
        print(f"{name:18s} {s * 1e3:8.2f} ms {mps}", flush=True)


if __name__ == "__main__":
    main()
