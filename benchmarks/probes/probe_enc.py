"""On-chip A/B of the device entropy encoder formulations at 4.2 MP scale.

Verifies bit-exactness of the Mosaic funnel-kernel + grouped-gather
compaction path against the host codec, then times it (marginal chains)
next to the scatter formulation.  Stage split (rows kernel alone vs full
encode_stream) localizes any regression.
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
from jpeg_tpu import entropy  # noqa: E402
from jpeg_tpu.entropy import device_codec as DC  # noqa: E402
from jpeg_tpu.ops import band as band_ops  # noqa: E402

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
    h = w = 2048
    cfg = Configuration(width=w, height=h, block_size=2, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
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
    enc = band_ops.make_encode(key, dt.name, pal)
    pl_d = jax.device_put(planes)
    levels = np.asarray(jax.jit(jax.vmap(enc))(pl_d)).reshape(-1, L)
    lv_d = jax.device_put(levels)
    print(f"backend={jax.default_backend()} blocks={levels.shape[0]}",
          file=sys.stderr, flush=True)

    # correctness on chip
    want = entropy.encode_levels(levels)
    buf, bb = jax.jit(DC.encode_stream)(lv_d)
    buf_np = np.asarray(buf)
    total = int(np.asarray(bb).sum())
    assert total == len(want), (total, len(want))
    assert buf_np[:total].tobytes() == want, "on-chip stream mismatch"
    assert not buf_np[total:].any(), "nonzero remainder"
    print(f"on-chip encode bit-exact ({total} bytes)", flush=True)

    def rec(name, secs):
        print(f"{name:22s} {secs * 1e3:8.2f} ms {mp / secs:9.1f} MP/s"
              if secs > 0 else f"{name:22s}   (<noise)", flush=True)

    def rows_only(lv):
        rows, bb = DC.encode_rows(lv)
        return lv + dep(rows) + dep(bb)
    rec("rows kernel", marginal(rows_only, lv_d))

    def full(lv):
        buf, bb = DC.encode_stream(lv)
        return lv + dep(buf) + dep(bb)
    rec("encode_stream (new)", marginal(full, lv_d))

    import os
    os.environ["JPEG_TPU_ENC_SCATTER"] = "1"

    def full_scatter(lv):
        buf, bb = DC.encode_stream(lv)
        return lv + dep(buf) + dep(bb)
    rec("encode_stream scatter", marginal(full_scatter, lv_d))
    del os.environ["JPEG_TPU_ENC_SCATTER"]


if __name__ == "__main__":
    main()
