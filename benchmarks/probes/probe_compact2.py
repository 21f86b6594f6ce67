"""On-chip probe, round 2: compaction gathers with MONOTONIC indices.

probe_compact.py used random indices and measured ~7-10 ns/index at every
granularity.  The decode path's production grouped gather (sequential-ish
block order) measured ~0.65 ns/index — gather cost depends on index
locality.  Compaction indices are monotonic by construction, so this probe
measures the real pattern: sorted group ids with realistic stride jitter,
plus the pairwise ragged-merge round and small-grid prefix passes.
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
    S = 5_000_000
    N = 49_152
    W = 48
    rng = np.random.default_rng(0)

    def rec(name, secs, n_idx=None):
        per = f"  {secs / n_idx * 1e9:6.2f} ns/idx" if n_idx else ""
        print(f"{name:28s} {secs * 1e3:9.3f} ms{per}", flush=True)

    # grouped gathers with MONOTONIC ids: out group g reads unit row
    # id(g) where id is nondecreasing (compaction pattern); table rows are
    # merged-unit rows (width Wu words)
    for G, Wu, nunits in ((4, 96, N // 8), (8, 400, N // 32),
                          (16, 800, N // 64)):
        nidx = S // 4 // G
        tbl = jnp.asarray(
            rng.integers(0, 1 << 30, (nunits, Wu), dtype=np.int32))
        # nondecreasing unit ids with realistic repeat counts
        ids = np.sort(rng.integers(0, nunits, nidx).astype(np.int32))
        offs = rng.integers(0, Wu - G, nidx).astype(np.int32)
        ids_d, offs_d = jnp.asarray(ids), jnp.asarray(offs)
        col = jnp.arange(G, dtype=np.int32)

        def g_sorted(x, tbl=tbl, ids=ids_d, offs=offs_d, col=col,
                     nunits=nunits):
            i = (ids + x[0]) % nunits
            out = tbl[i[:, None], offs[:, None] + col[None, :]]
            return x + dep(out)
        rec(f"sorted 2d-gather G={G:2d}",
            marginal(g_sorted, jnp.zeros(4, jnp.int32)), nidx)

        # same but gather whole G-word rows from a (nunits*Wu/G, G) table
        # via row ids only (decode-style: tbl[idx] with idx (nidx,))
        tblg = tbl.reshape(-1, G)
        ng = tblg.shape[0]
        gids = np.sort(rng.integers(0, ng, nidx).astype(np.int32))
        gids_d = jnp.asarray(gids)

        def g_rows(x, tblg=tblg, gids=gids_d, ng=ng):
            out = tblg[(gids + x[0]) % ng]
            return x + dep(out)
        rec(f"sorted row-gather G={G:2d}",
            marginal(g_rows, jnp.zeros(4, jnp.int32)), nidx)

    # one pairwise ragged merge round (N/2 pairs, width 2W)
    rows = jnp.asarray(rng.integers(0, 1 << 30, (N, W), dtype=np.int32))
    lens = jnp.asarray(rng.integers(8, 4 * W, N, dtype=np.int32))

    def merge_round(x):
        A = rows[0::2] + x[0]
        B = rows[1::2]
        la = lens[0::2]
        W2 = 2 * W
        Ap = jnp.concatenate([A, jnp.zeros_like(A)], axis=1)
        Bp = jnp.concatenate([B, jnp.zeros_like(B)], axis=1)
        sh = (la >> 2)[:, None]
        k = 1
        while k < W2:
            rolled = jnp.concatenate(
                [jnp.zeros((Bp.shape[0], k), Bp.dtype), Bp[:, :-k]], axis=1)
            Bp = jnp.where(sh >= k, rolled, Bp)
            sh = jnp.where(sh >= k, sh - k, sh)
            k <<= 1
        r = ((la & 3) * 8)[:, None].astype(jnp.uint32)
        Bu = Bp.astype(jnp.uint32)
        prev = jnp.concatenate(
            [jnp.zeros((Bu.shape[0], 1), jnp.uint32), Bu[:, :-1]], axis=1)
        Bs = (Bu >> r) | ((prev << (jnp.uint32(31) - r)) << 1)
        out = Ap | Bs.astype(jnp.int32)
        return x + dep(out)
    rec("merge round N/2 x 96w", marginal(merge_round,
                                          jnp.zeros(4, jnp.int32)))

    # small-grid prefix passes (id tables for ~160k output groups)
    grid = jnp.asarray(rng.integers(0, 3, 160_000, dtype=np.int32))

    def g_small(x):
        c = jnp.cumsum(grid + x[0])
        m = jax.lax.associative_scan(jnp.maximum, c)
        return x + dep(m)
    rec("cumsum+maxscan 160k", marginal(g_small, jnp.zeros(4, jnp.int32)))

    print(f"backend={jax.default_backend()}", flush=True)


if __name__ == "__main__":
    main()
