"""On-chip probe: can the combined coefficient ENCODE beat the single
dot_general?

device_profile_r3 shows coeff_enc at 0.59 ms for 3 bands of 4.2 MP =
43 GB/s effective (5% of HBM peak) — the jointly-contracted (r, c) axes
force XLA to materialize a blockify transpose of the f32 plane.  Variants:

  a. joint-dot (current)  x4 (NV,D,NH,D) . op4 (D,D,L) contracting (1,3)
  b. two-stage            vertical (D->d) then horizontal (D->d) contraction
                          + static zigzag take (different f32 summation
                          order: NOT bit-identical to (a) by construction;
                          level diffs counted)
  c. conv                 lax.conv_general_dilated, kernel (D,D,1,L),
                          stride D — same reduction as (a) through XLA's
                          conv emitters
  d. two-stage-u8         (b) with the cast fused into the first contraction

Timing: marginal in-program chains (see device_profile.py).
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

from jpeg_tpu import Configuration, QuantizationMethod  # noqa: E402
from jpeg_tpu.ops import quantize as Q  # noqa: E402
from jpeg_tpu.ops import transform as T  # noqa: E402

K1, K2 = 2, 10
H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BS, DCT = 2, 8
D = BS * DCT
L = DCT * DCT
NV, NH = H // D, W // D
method = QuantizationMethod("qtable")


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
    return max((t2 - t1) / (K2 - K1), 1e-9)


def dep(x):
    return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)


op2 = T.combined_encode_operator(DCT, BS, "DCT")          # (L, D*D)
op4 = jnp.asarray(np.asarray(op2).T.reshape(D, D, L), jnp.float32)
zz = T.zigzag_permutation(DCT)                            # (L,) r*d+c -> zig

# Separable factors: combined vertical/horizontal subsample+DCT (d, D).
# combined op columns are kron-structured: op2[l, r*D+c] = Av[zr(l), r] *
# Ah[zc(l), c]; rebuild Av/Ah directly from first principles instead:
# subsample = mean over bs, DCT = unnormalized cos matrix (transforms.py:4-11).
A = np.asarray(T.dct_matrix(DCT))                          # (d, d) cos
S = np.kron(np.eye(DCT), np.full((1, BS), 1.0 / BS))       # (d, D) mean-pool
Av = jnp.asarray(A @ S, jnp.float32)                       # (d, D)
Ah = Av


def enc_a(p):                                              # joint dot
    x4 = p.astype(jnp.float32).reshape(3, NV, D, NH, D)
    coeffs = jax.lax.dot_general(
        x4, op4, (((2, 4), (0, 1)), ((), ())),
        precision=T._mm_precision())                       # (3, NV, NH, L)
    return Q.quantize(coeffs.reshape(-1, L), method, DCT).astype(jnp.int32)


ZI = np.zeros(L, np.int64)
for rc in range(L):
    ZI[int(np.asarray(zz)[rc])] = rc                       # zig slot -> r*d+c
ZI = jnp.asarray(np.argsort(np.argsort(np.asarray(zz))), jnp.int32)


def _two_stage(x4f):
    # vertical: contract the D row axis -> (3, NV, NH, D, d)
    t1 = jax.lax.dot_general(x4f, Av.T, (((2,), (0,)), ((), ())),
                             precision=T._mm_precision())  # (3,NV,NH,D,r)
    t2 = jax.lax.dot_general(t1, Ah.T, (((3,), (0,)), ((), ())),
                             precision=T._mm_precision())  # (3,NV,NH,r,c)
    rc = t2.reshape(3 * NV * NH, L)                        # r-major
    return jnp.take(rc, jnp.asarray(zz, jnp.int32), axis=1)


def enc_b(p):
    x4 = p.astype(jnp.float32).reshape(3, NV, D, NH, D)
    coeffs = _two_stage(x4)
    return Q.quantize(coeffs, method, DCT).astype(jnp.int32)


def enc_c(p):                                              # conv path
    x = p.astype(jnp.float32).reshape(3, H, W, 1)
    k = op4.reshape(D, D, 1, L)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(D, D), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=T._mm_precision())                       # (3, NV, NH, L)
    return Q.quantize(out.reshape(-1, L), method, DCT).astype(jnp.int32)


def enc_d(p):                                              # u8 into stage 1
    x4 = p.reshape(3, NV, D, NH, D)
    t1 = jax.lax.dot_general(x4.astype(jnp.float32), Av.T,
                             (((2,), (0,)), ((), ())),
                             precision=T._mm_precision())
    t2 = jax.lax.dot_general(t1, Ah.T, (((3,), (0,)), ((), ())),
                             precision=T._mm_precision())
    coeffs = jnp.take(t2.reshape(3 * NV * NH, L),
                      jnp.asarray(zz, jnp.int32), axis=1)
    return Q.quantize(coeffs, method, DCT).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    planes = np.stack([
        np.clip(128 + 70 * np.sin(x / (17 + 6 * c)) * np.cos(y / (23 - 4 * c))
                + 8 * rng.standard_normal((H, W)), 0, 255)
        for c in range(3)]).astype(np.uint8)
    p_d = jax.device_put(jnp.asarray(planes))

    ref = np.asarray(jax.jit(enc_a)(p_d))
    for name, fn in [("a joint-dot", enc_a), ("b two-stage", enc_b),
                     ("c conv", enc_c), ("d two-stage-u8", enc_d),
                     ("e plane-form", enc_e), ("f batch-form", enc_f), ("g vmap-form", enc_g)]:
        got = np.asarray(jax.jit(fn)(p_d))
        ndiff = int((got != ref).sum())
        mdiff = int(np.abs(got.astype(np.int64) - ref).max()) if ndiff else 0
        body = lambda q, f=fn: q + (dep(f(q))).astype(q.dtype)
        ms = marginal(body, p_d) * 1e3
        mp = 3 * H * W / 1e6 / 3  # image MP (bands counted once, as profile)
        print(f"{name:16s} {ms:7.3f} ms  {H*W/1e6/ms*1e3:8.1f} MP/s  "
              f"diff levels: {ndiff} (max {mdiff})", flush=True)




def enc_e(p):
    """Plane-form two-stage: stage 1 contracts the row axis of the
    (3, NV, D, W) view (W stays minor/contiguous); stage 2 contracts the
    column-subblock axis of the (3, NV, r, NH, D) view."""
    x4 = p.astype(jnp.float32).reshape(3, NV, D, W)
    # (r, D) x (3, NV, D, W) -> lhs free r first: (r, 3, NV, W)
    t1 = jax.lax.dot_general(Av, x4, (((1,), (2,)), ((), ())),
                             precision=T._mm_precision())   # (r, 3, NV, W)
    t1 = t1.reshape(DCT, 3, NV, NH, D)
    # contract D with Ah (c, D) -> (r, 3, NV, NH, c)
    t2 = jax.lax.dot_general(t1, Ah, (((4,), (1,)), ((), ())),
                             precision=T._mm_precision())   # (r,3,NV,NH,c)
    rc = jnp.transpose(t2, (1, 2, 3, 0, 4)).reshape(3 * NV * NH, L)
    coeffs = jnp.take(rc, jnp.asarray(zz, jnp.int32), axis=1)
    return Q.quantize(coeffs, method, DCT).astype(jnp.int32)


def enc_f(p):
    """Plane-form, batch-style: both stages keep (3, NV|rows) leading and
    contract trailing-view axes; zigzag folded into a (r*c -> L) take."""
    x = p.astype(jnp.float32).reshape(3 * NV, D, W)
    t1 = jax.lax.dot_general(x, Av.T, (((1,), (0,)), ((), ())),
                             precision=T._mm_precision())   # (3NV, W, r)
    t1 = t1.reshape(3 * NV, NH, D, DCT)
    t2 = jax.lax.dot_general(t1, Ah.T, (((2,), (0,)), ((), ())),
                             precision=T._mm_precision())   # (3NV, NH, r, c)
    rc = t2.reshape(3 * NV * NH, L)                         # r-major? (c,r)!
    # t2 minor dims are (r, c) with r from stage 1's minor: order is (.., r, c)
    coeffs = jnp.take(rc, jnp.asarray(zz, jnp.int32), axis=1)
    return Q.quantize(coeffs, method, DCT).astype(jnp.int32)



def enc_g(p):
    """Batch-form via vmap over bands (how api._encode3_fn drives it)."""
    def one(band):
        x = band.astype(jnp.float32).reshape(NV, D, W)
        t1 = jax.lax.dot_general(x, Av.T, (((1,), (0,)), ((), ())),
                                 precision=T._mm_precision())
        t1 = t1.reshape(NV, NH, D, DCT)
        t2 = jax.lax.dot_general(t1, Ah.T, (((2,), (0,)), ((), ())),
                                 precision=T._mm_precision())
        rc = t2.reshape(NV * NH, L)
        coeffs = jnp.take(rc, jnp.asarray(zz, jnp.int32), axis=1)
        return Q.quantize(coeffs, method, DCT).astype(jnp.int32)
    return jax.vmap(one)(p).reshape(-1, L)

if __name__ == "__main__":
    main()
