"""Device-resident per-stage profile via in-program dependent chains.

Methodology (the only trustworthy one through the axon tunnel): each stage
is measured as the MARGINAL cost of extra iterations inside ONE jitted
program — ``fori_loop`` chains of k1 and k2 data-dependent iterations, one
fenced call each, per-op = (t(k2) - t(k1)) / (k2 - k1).  Repeated-dispatch
timing (queue N async calls, fence once) is NOT reliable on this backend:
identical dispatches can be deduplicated/elided (reading ~0.03 ms for real
work) or serialized per-call round trips (reading 100-400 ms for ~1 ms
kernels).  Chained iterations are data-dependent, so nothing can be elided,
and the per-call dispatch/RTT constant (~35-85 ms through the tunnel)
cancels in the difference.

Usage:  python benchmarks/device_profile.py [H W] [--json out.json]
          [--dct D] [--bs B] [--quant qtable|divide|none] [--qdivisor N]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from jpeg_tpu import Configuration, QuantizationMethod, api  # noqa: E402
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402

# Chain depths: deeper K2 buys signal-to-noise on sub-0.3 ms stages at the
# cost of compile+run time (tunnel RTT jitter is ~0.5-1 ms per fenced call).
K1 = int(os.environ.get("CHAIN_K1", "2"))
K2 = int(os.environ.get("CHAIN_K2", "10"))


import itertools  # noqa: E402

_salt_counter = itertools.count(1)


def _salt():
    """Fresh 4-byte scalar device arg per timed call.

    The axon proxy DEDUPLICATES identical dispatches: re-running the same
    executable on the same argument buffers can return a cached result in
    ~0.1 ms instead of executing (observed mid-round-4: a fused_dec chain
    read 0.00 ms / 2000% of HBM peak).  Threading a distinct scalar
    through every call makes each (executable, args) pair unique, so the
    timed call after the warm call really runs."""
    import numpy as _np
    return jax.device_put(_np.int32(next(_salt_counter)))


WALL_REPS = int(os.environ.get("WALL_REPS", "3"))


def _wall_once(fn, *args) -> float:
    """Best-of-N fenced calls (fresh salt each): the per-call tunnel RTT
    carries 10s-of-ms spikes; min() is the standard spike rejector and
    the marginal difference cancels the floor RTT."""
    jax.block_until_ready(fn(*args, _salt()))   # compile + warm
    best = float("inf")
    for _ in range(WALL_REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, _salt()))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(body, init) -> float:
    """Seconds per op: marginal cost of k2-k1 extra in-program iterations."""
    def chain(k):
        return jax.jit(lambda x, s: (
            jax.lax.fori_loop(0, k, lambda i, c: body(c), x), s))
    t1 = _wall_once(chain(K1), init)
    t2 = _wall_once(chain(K2), init)
    return max(0.0, (t2 - t1) / (K2 - K1))


def main() -> None:
    rest = list(sys.argv[1:])

    def flag(name, default):
        if name in rest:
            i = rest.index(name)
            v = rest[i + 1]
            del rest[i:i + 2]
            return v
        return default

    out_json = flag("--json", None)
    dct = int(flag("--dct", 8))
    bs = int(flag("--bs", 2))
    quant = flag("--quant", "qtable" if dct == 8 else "divide")
    qdivisor = float(flag("--qdivisor", 1000))
    argv = [a for a in rest if not a.startswith("--")]
    h = int(argv[0]) if len(argv) > 0 else 2048
    w = int(argv[1]) if len(argv) > 1 else 2048

    qm = (QuantizationMethod("divide", divisor=qdivisor)
          if quant == "divide" else QuantizationMethod(quant))
    cfg = Configuration(width=w, height=h, block_size=bs, dct_size=dct,
                        quantization=qm)
    rng = np.random.default_rng(0)
    yx = np.mgrid[0:h, 0:w]
    plane = np.clip(128 + 70 * np.sin(yx[1] / 17.0) * np.cos(yx[0] / 23.0)
                    + 30 * np.sin((yx[0] + yx[1]) / 9.0)
                    + 8 * rng.standard_normal((h, w)), 0, 255)
    img = np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8)
    planes = np.ascontiguousarray(img.transpose(2, 0, 1))
    mp = h * w / 1e6

    dt, pal = api._dt_and_pallas(cfg, None)
    key = band_ops.config_key(cfg)
    nb, L = cfg.num_blocks, cfg.dct_size ** 2
    print(f"backend={jax.default_backend()} image={h}x{w} ({mp:.1f} MP) "
          f"blocks={3 * nb} L={L} pallas={pal} chain {K1}->{K2}",
          file=sys.stderr)

    enc = band_ops.make_encode_batch(key, dt.name, pal)
    dec = band_ops.make_decode(key, dt.name, pal)
    pl_d = jax.device_put(planes)
    levels = np.asarray(jax.jit(enc)(pl_d)).reshape(-1, L)
    stream = entropy.encode_levels(levels)
    starts = entropy.scan_offsets(stream, 3 * nb, L)
    from jpeg_tpu.utils.device import pow2_cap
    pad = pow2_cap(len(stream))
    arr = np.zeros(pad, np.uint8)
    arr[:len(stream)] = np.frombuffer(stream, np.uint8)
    # production form: LE words viewed on the host (free), byteswapped on
    # device — the u8 -> u32 bitcast relayout measured 0.76 ms for 1.3 MB
    arr_d = jax.device_put(DC.host_stream_arg(arr))
    st_d = jax.device_put(starts.astype(np.int32))
    total = np.int32(len(stream))
    lv_d = jax.device_put(levels)
    print(f"stream: {len(stream)} bytes ({3 * h * w / len(stream):.2f}x)",
          file=sys.stderr)

    # production decode passes the bucketed longest-block width, which
    # sizes the overlap-row gather and the kernel's trimmed width
    bucket_bb = DC.bucket_block_bytes(
        L, DC.max_block_bytes_of(starts, len(stream)))
    srt = DC.sort_pays_off(starts, len(stream))   # production sort decision
    print(f"decode geometry: G={DC.dec_group(L, bucket_bb)} "
          f"weff={DC.dec_weff(L, bucket_bb)} "
          f"(worst case G={DC.dec_group(L, 0)}) sort={srt}", file=sys.stderr)

    # correctness gate before timing anything
    got = np.asarray(jax.jit(
        lambda s, t: DC.decode_stream(s, t, L, bucket_bb, sort=srt,
                                      total_len=total))(arr_d, st_d))
    assert np.array_equal(got, levels), "device decode mismatch"

    results = {}

    # Roofline accounting: algorithmic bytes (inputs read + outputs written,
    # the HBM traffic lower bound — fused intermediates live in VMEM) per
    # stage, reported as effective GB/s and % of the chip's peak HBM
    # bandwidth.  v5e peak = 819 GB/s (public spec); override with HBM_GBPS.
    hbm_gbps = float(os.environ.get("HBM_GBPS", "819"))
    plane_b = planes.nbytes                       # 3*H*W uint8
    levels_b = levels.nbytes                      # 3*nb*L int32
    stream_b = len(stream)
    starts_b = st_d.nbytes
    bb_b = levels.shape[0] * 4

    def record(name, secs, nbytes=None):
        row = {"ms": round(secs * 1e3, 3),
               "mps": round(mp / secs, 1) if secs > 0 else None}
        bwtxt = ""
        if nbytes is not None:
            row["bytes_min"] = int(nbytes)
            if secs > 0:
                gbps = nbytes / secs / 1e9
                row["gbps_eff"] = round(gbps, 1)
                row["hbm_pct"] = round(100 * gbps / hbm_gbps, 1)
                bwtxt = (f"  {nbytes / 1e6:7.1f} MB {gbps:7.1f} GB/s "
                         f"{row['hbm_pct']:5.1f}% HBM")
        results[name] = row
        mps = f"{mp / secs:9.1f} MP/s" if secs > 0 else "  (< noise)"
        print(f"{name:17s} {secs * 1e3:8.2f} ms {mps}{bwtxt}",
              file=sys.stderr)

    dtp = planes.dtype

    def dep(x):
        # Runtime-zero data dependence XLA cannot fold away (x & 0 or
        # x * 0 would be algebraically simplified and the body DCE'd).
        # REDUCES over the whole array: a single-element dependence lets
        # XLA slice-push through trailing pure-XLA stages (e.g. compute
        # only one deblockify element) and understate them.  The
        # optimization barrier stops RANGE ANALYSIS from proving the
        # reduce constant: a clip(round(...), 0, 255) stage output is
        # provably nonnegative, so min(|x|, 0) folds to 0 and the whole
        # stage DCEs — the d24 roundtrip row read "< noise" through
        # exactly that hole.
        x = jax.lax.optimization_barrier(x)
        return jnp.minimum(jnp.min(jnp.abs(x)).astype(jnp.int32), 0)

    def coeff_enc(p):
        lv = enc(p)
        return p + dep(lv).astype(dtp)

    record("coeff_enc", marginal(coeff_enc, pl_d), plane_b + levels_b)

    # Worst-case (non-sized) entropy stages are the shape-oblivious
    # FALLBACK, not the production path (api dispatches the content-sized
    # two-phase encode by default).  At large L they are pathological by
    # construction — the L=576 lv kernel's full-W buffer makes each append
    # funnel-shift ~416 word rows, minutes of device time for a path never
    # taken — so SKIP_WORST=1 (or L > 150) omits them from the capture.
    skip_worst = bool(int(os.environ.get(
        "SKIP_WORST", "1" if L > 150 else "0")))
    if skip_worst:
        print("skipping worst-case entropy_enc/fused_enc (fallback path; "
              "SKIP_WORST)", file=sys.stderr)
    else:
        def ent_enc(lv):
            buf, bb = DC.encode_stream(lv)
            # dep on BOTH outputs: depending only on the byte counts lets
            # XLA dead-code the stream-buffer scatters (the actual work)
            return lv + dep(buf) + dep(bb)

        record("entropy_enc", marginal(ent_enc, lv_d),
               levels_b + stream_b + bb_b)

        def fused_enc(p):
            lv = enc(p)
            buf, bb, mx = DC.encode_bands_stream(
                lv.reshape(-1, L), 3)
            return p + (dep(buf) + dep(bb) + dep(mx)).astype(dtp)

        record("fused_enc", marginal(fused_enc, pl_d),
               plane_b + stream_b + bb_b)

    # Content-sized two-phase encode (production path, api.py:_start_compress):
    # phase 1 = coeff + stream geometry stats; phase 2 = entropy encode at
    # the bucketed row width / output cap derived from the actual content.
    bb_np = np.asarray(jax.jit(DC.block_bytes_of)(lv_d))
    W = DC.encode_words_bucket(L, int(bb_np.max()))
    cap = DC.encode_cap_bucket(int(bb_np.sum()),
                               levels.shape[0] * DC.worst_case_block_bytes(L))
    mu = int(jax.jit(DC.min_unit_bytes_of)(jnp.asarray(bb_np)))
    G = DC.gather_group_bucket(mu, levels.shape[0], W)
    print(f"sized buckets: W={W} (full {DC.encode_words_full(L)}) "
          f"cap={cap} G={G}", file=sys.stderr)
    got_sz = np.asarray(jax.jit(
        lambda lv: DC.encode_stream_sized(lv, W, cap, G)[0])(lv_d))
    assert got_sz[:len(stream)].tobytes() == stream, "sized encode mismatch"

    def enc_phase1(p):
        lv = enc(p).reshape(-1, L)
        b = DC.block_bytes_of(lv)
        return p + (dep(lv) + dep(b) + dep(DC.min_unit_bytes_of(b))
                    ).astype(dtp)

    record("enc_phase1", marginal(enc_phase1, pl_d), plane_b + levels_b + bb_b)

    def ent_enc_sized(lv):
        buf, b, _bad = DC.encode_stream_sized(lv, W, cap, G)
        return lv + dep(buf) + dep(b)

    record("entropy_enc_sized", marginal(ent_enc_sized, lv_d), levels_b + stream_b + bb_b)
    p1 = results["enc_phase1"]["ms"]
    p2 = results["entropy_enc_sized"]["ms"]
    record("enc_sized_total", (p1 + p2) / 1e3, plane_b + 2 * levels_b + stream_b + bb_b)

    def ent_dec(st):
        lv = DC.decode_stream(arr_d, st, L, bucket_bb, sort=srt,
                              total_len=total)
        return st + dep(lv)

    record("entropy_dec", marginal(ent_dec, st_d), stream_b + starts_b + levels_b)

    def coeff_dec(lv):
        p = jax.vmap(dec)(lv.reshape(3, nb, L))
        return lv + dep(p)

    record("coeff_dec", marginal(coeff_dec, lv_d), levels_b + plane_b)

    def fused_dec(st):
        lv = DC.decode_stream(arr_d, st, L, bucket_bb, sort=srt,
                              total_len=total)
        p = jax.vmap(dec)(lv.reshape(3, nb, L))
        return st + dep(p)

    record("fused_dec", marginal(fused_dec, st_d), stream_b + starts_b + plane_b)

    # ONE-dispatch host-free decode of a FOREIGN stream: in-program
    # boundary scan (walker table + multi-chain orbit chase) feeding the
    # bit parse + IDCT — no host scan, no starts upload
    # (api._decode3_foreign_fn; policy: entropy/device_scan.py:scan_mode).
    from jpeg_tpu.entropy import device_scan as DS
    streams3 = []
    off = 0
    st_np = np.asarray(starts)
    for b in range(3):
        lo, hi = b * nb, (b + 1) * nb
        end = st_np[hi] if hi < len(st_np) else len(stream)
        streams3.append(int(end) - off)
        off = int(end)
    ends_d = jax.device_put(np.cumsum(streams3).astype(np.int32))
    max_bb = DC.max_block_bytes_of(st_np, len(stream))
    rung = next((r for r in DS.span_rungs(L) if r and max_bb <= r), 0)
    mb_rung = DC.bucket_block_bytes(L, rung) if rung else 0
    # Quarter-octave padding, as the api's foreign path: every padded
    # byte is a walker, and the tighter cap also keeps the chase E table
    # inside the VMEM kernel's budget where pow2 padding would spill to
    # the pointer-doubling fallback (~10x at 4K).
    from jpeg_tpu.utils.device import quarter_cap
    qpad = quarter_cap(len(stream))
    qarr = np.zeros(qpad, np.uint8)
    qarr[:len(stream)] = np.frombuffer(stream, np.uint8)
    qarr_d = jax.device_put(DC.host_stream_arg(qarr))

    def foreign_dec(x):
        st2, ok = DS.scan_bands_starts(qarr_d, ends_d, nb, L, span_cap=rung)
        lv = DC.decode_stream(qarr_d, st2, L, mb_rung, sort=False,
                              total_len=ends_d[-1])
        p = jax.vmap(dec)(lv.reshape(3, nb, L))
        return x + dep(p) + jnp.where(ok, 0, 1)

    st2_chk, ok_chk = jax.jit(lambda: DS.scan_bands_starts(
        qarr_d, ends_d, nb, L, span_cap=rung))()
    assert bool(ok_chk), "foreign scan rejected a valid stream"
    assert np.array_equal(np.asarray(st2_chk), st_np), "foreign starts differ"
    record("foreign_dec", marginal(foreign_dec, jax.device_put(np.int32(0))),
           stream_b + plane_b)

    # Device-resident round trip: planes -> coefficients -> bitstream ->
    # coefficients -> planes in ONE program, stream never leaving HBM —
    # the on-device analog of the full compress_band/decompress_band pair
    # (reference pipeline/__init__.py:71-88).  Uses the production pieces:
    # sized entropy encode (its W/cap/G statics from the host-bucketed
    # stats, the in-program poison flag consumed), the zero-relayout BE-word
    # interchange (emit="words" -> decode_stream direct), and block starts
    # from the encoder's own byte counts (exclusive cumsum, no host scan).
    def rt_core(p):
        lv = enc(p).reshape(-1, L)
        words, bb, bad = DC.encode_stream_sized(lv, W, cap, G, emit="words")
        st = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(bb)[:-1].astype(jnp.int32)])
        lv2 = DC.decode_stream(words, st, L, bucket_bb, sort=srt,
                               total_len=bb.sum().astype(jnp.int32))
        return jax.vmap(dec)(lv2.reshape(3, nb, L)), bad

    def roundtrip(p):
        p2, bad = rt_core(p)
        return p + (dep(p2) + bad.astype(jnp.int32)).astype(dtp)

    # correctness gate: the round trip reproduces the decoded planes
    planes_ref = np.asarray(jax.jit(
        lambda lv: jax.vmap(dec)(lv.reshape(3, nb, L)))(lv_d))
    got_rt, got_bad = jax.jit(rt_core)(pl_d)
    assert not bool(got_bad), "sized round trip overflowed"
    assert np.array_equal(np.asarray(got_rt), planes_ref), \
        "device round trip mismatch"
    record("roundtrip", marginal(roundtrip, pl_d),
           2 * plane_b + 2 * stream_b + 2 * bb_b + levels_b)

    # Batch-level device-resident round trip (BASELINE config 5's shape at
    # slice scale): B images -> levels -> ONE content-sized stream ->
    # levels -> planes, nothing leaving HBM.  Blocks of the whole batch
    # feed the entropy kernels as one (B*3*nb, L) batch — the batch is
    # just a bigger block count, so the kernels amortize their fixed
    # costs; skipped when the worst-case bit positions would leave int32.
    B = int(os.environ.get("BATCH_B", "4"))
    if B <= 0:
        print("skipping roundtrip_batch (BATCH_B=0)", file=sys.stderr)
    elif B * levels.shape[0] * DC.worst_case_block_bytes(L) * 8 < DC._CAP_BITS:
        pls = np.stack([planes] * B)                   # (B, 3, H, W)
        pls_d = jax.device_put(pls)
        capB = DC.encode_cap_bucket(
            B * int(bb_np.sum()),
            B * levels.shape[0] * DC.worst_case_block_bytes(L))

        def rtb_core(p):
            lv = enc(p.reshape(B * 3, h, w)).reshape(-1, L)
            words, bb, bad = DC.encode_stream_sized(lv, W, capB, G,
                                                    emit="words")
            st = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(bb)[:-1].astype(jnp.int32)])
            lv2 = DC.decode_stream(words, st, L, bucket_bb, sort=srt,
                                   total_len=bb.sum().astype(jnp.int32))
            return (jax.vmap(dec)(lv2.reshape(B * 3, nb, L)), bad)

        def roundtrip_batch(p):
            p2, bad = rtb_core(p)
            return p + (dep(p2) + bad.astype(jnp.int32)).astype(dtp)

        got_rtb, bad_rtb = jax.jit(rtb_core)(pls_d)
        assert not bool(bad_rtb), "batch round trip overflowed"
        assert np.array_equal(
            np.asarray(got_rtb).reshape(B, 3, h, w)[0], planes_ref), \
            "batch round trip mismatch"
        secs = marginal(roundtrip_batch, pls_d)
        row_bytes = B * (2 * plane_b + 2 * stream_b + 2 * bb_b + levels_b)
        row = {"ms": round(secs * 1e3, 3),
               "mps": round(B * mp / secs, 1) if secs > 0 else None,
               "batch": B}
        if secs > 0:
            gbps = row_bytes / secs / 1e9
            row["bytes_min"] = int(row_bytes)
            row["gbps_eff"] = round(gbps, 1)
            row["hbm_pct"] = round(100 * gbps / hbm_gbps, 1)
        results["roundtrip_batch"] = row
        print(f"roundtrip_batch   {secs * 1e3:8.2f} ms "
              f"{(B * mp / secs if secs > 0 else 0):9.1f} MP/s (B={B})",
              file=sys.stderr)
    else:
        print(f"skipping roundtrip_batch (B={B} exceeds int32 bit "
              "positions at this geometry)", file=sys.stderr)

    if out_json:
        with open(out_json, "w") as f:
            json.dump({"image": [h, w], "megapixels": mp,
                       "chain": [K1, K2],
                       "backend": jax.default_backend(),
                       "method": "in-program dependent chains (marginal)",
                       "stages": results}, f, indent=1)
        print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
