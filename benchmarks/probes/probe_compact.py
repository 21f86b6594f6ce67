"""On-chip probe: cost of candidate ragged-row -> stream compaction primitives.

The device entropy ENCODER's output is per-block byte rows (avg ~25 B,
worst 188 B); the file format needs them concatenated byte-exactly.  This
probe measures the building blocks on the real chip so the compaction
design is driven by measured costs, not the (wrong) intuition that gathers
are free:

  a. flat byte gather           out[j] = src[idx[j]]         (~S indices)
  b. word gather                (~S/4 indices)
  c. grouped row gather         tbl[idx] of (Ng, G) groups   (~S/4G indices)
  d. take_along_axis last-axis  (N, W) per-row gather
  e. cumsum / max-scan over S   (prefix passes the mapping needs)
  f. log-depth variable roll    one pairwise ragged merge round

Methodology: marginal in-program chains (see device_profile.py) — the only
dispatch-safe timing through the tunnel.
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

K1, K2 = 2, 8


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
    S = 5_000_000            # stream bytes (4.2 MP image scale)
    N = 49_152               # blocks
    W = 48                   # words per block row
    rng = np.random.default_rng(0)

    src = jnp.asarray(rng.integers(0, 127, S, dtype=np.int32))
    idxS = jnp.asarray(rng.integers(0, S, S, dtype=np.int32))
    srcW = jnp.asarray(rng.integers(0, 1 << 30, S // 4, dtype=np.int32))
    idxW = jnp.asarray(rng.integers(0, S // 4, S // 4, dtype=np.int32))
    rows = jnp.asarray(rng.integers(0, 1 << 30, (N, W), dtype=np.int32))

    def rec(name, secs, n_idx=None):
        per = f"  {secs / n_idx * 1e9:6.2f} ns/idx" if n_idx else ""
        print(f"{name:28s} {secs * 1e3:9.3f} ms{per}", flush=True)

    # a. flat byte-granular gather, S indices
    def g_flat(x):
        out = src[(idxS + x[0]) % S]
        return x + dep(out)
    rec("flat gather S idx", marginal(g_flat, jnp.zeros(4, jnp.int32)), S)

    # b. flat word gather, S/4 indices
    def g_word(x):
        out = srcW[(idxW + x[0]) % (S // 4)]
        return x + dep(out)
    rec("word gather S/4 idx", marginal(g_word, jnp.zeros(4, jnp.int32)),
        S // 4)

    # c. grouped row gather at several G
    for G in (4, 8, 16, 32):
        tbl = srcW.reshape(-1, G) if (S // 4) % G == 0 else \
            srcW[: (S // 4) // G * G].reshape(-1, G)
        ng = tbl.shape[0]
        nidx = S // 4 // G
        gi = jnp.asarray(rng.integers(0, ng, nidx, dtype=np.int32))

        def g_grp(x, tbl=tbl, gi=gi, ng=ng):
            out = tbl[(gi + x[0]) % ng]
            return x + dep(out)
        rec(f"group gather G={G:2d}", marginal(g_grp, jnp.zeros(4, jnp.int32)),
            nidx)

    # d. per-row take_along_axis on (N, Wb) byte rows (decode-assembly shape)
    ta_idx = jnp.asarray(rng.integers(0, W, (N, W), dtype=np.int32))

    def g_ta(x):
        out = jnp.take_along_axis(rows, (ta_idx + x[0]) % W, axis=1)
        return x + dep(out)
    rec("take_along (N,48)", marginal(g_ta, jnp.zeros(4, jnp.int32)), N * W)

    # e. prefix passes over S
    big = src

    def g_cumsum(x):
        return x + dep(jnp.cumsum(big + x[0]))
    rec("cumsum 5M", marginal(g_cumsum, jnp.zeros(4, jnp.int32)))

    def g_scanmax(x):
        return x + dep(jax.lax.associative_scan(jnp.maximum, big + x[0]))
    rec("assoc-scan max 5M", marginal(g_scanmax, jnp.zeros(4, jnp.int32)))

    # f. one pairwise ragged merge round: (N/2 pairs, width 2W) with
    # log-depth variable word roll + byte funnel + OR
    lens = jnp.asarray(rng.integers(8, 4 * W, N, dtype=np.int32))

    def merge_round(x):
        A = rows[0::2] + x[0]
        B = rows[1::2]
        la = lens[0::2]
        W2 = 2 * W
        Ap = jnp.concatenate([A, jnp.zeros_like(A)], axis=1)
        Bp = jnp.concatenate([B, jnp.zeros_like(B)], axis=1)
        # word roll right by (la >> 2), log-depth selects
        sh = (la >> 2)[:, None]
        k = 1
        while k < W2:
            rolled = jnp.concatenate(
                [jnp.zeros((Bp.shape[0], k), Bp.dtype), Bp[:, :-k]], axis=1)
            Bp = jnp.where(sh >= k, rolled, Bp)
            sh = jnp.where(sh >= k, sh - k, sh)
            k <<= 1
        # byte funnel by (la & 3) * 8 bits
        r = ((la & 3) * 8)[:, None].astype(jnp.uint32)
        Bu = Bp.astype(jnp.uint32)
        prev = jnp.concatenate(
            [jnp.zeros((Bu.shape[0], 1), jnp.uint32), Bu[:, :-1]], axis=1)
        Bs = (Bu >> r) | ((prev << (jnp.uint32(31) - r)) << 1)
        out = Ap | Bs.astype(jnp.int32)
        return x + dep(out)
    rec("merge round N/2 x 96w", marginal(merge_round,
                                          jnp.zeros(4, jnp.int32)))

    print(f"backend={jax.default_backend()}", flush=True)


if __name__ == "__main__":
    main()
