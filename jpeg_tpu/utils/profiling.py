"""Tracing, timing and metrics (SURVEY.md §5: absent in the reference).

* :class:`StageTimer` — wall-clock per-stage timing with
  ``jax.block_until_ready`` fencing, so device async dispatch doesn't hide
  stage costs.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto-compatible trace directory when enabled.
* :class:`Metrics` — the BASELINE.md metric set (megapixels/s, compressed
  bytes, compression ratio, PSNR) with one-line JSON reporting.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax


class _StageScope:
    """Registers values to fence (block_until_ready) when the stage exits."""

    def __init__(self) -> None:
        self._pending = []

    def fence(self, value):
        """Mark device value(s) whose completion this stage must include."""
        self._pending.append(value)
        return value


class StageTimer:
    """Accumulates wall time per named stage.

    Register device outputs on the yielded scope so the stage includes their
    execution (async dispatch otherwise returns immediately):

    >>> t = StageTimer()
    >>> with t.stage("dct") as s:
    ...     out = s.fence(fn(x))   # blocked on at stage exit
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[_StageScope]:
        scope = _StageScope()
        t0 = time.perf_counter()
        try:
            yield scope
        finally:
            for v in scope._pending:
                jax.block_until_ready(v)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {k: round(v, 6) for k, v in
                sorted(self.totals.items(), key=lambda kv: -kv[1])}

    def __str__(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{k:>24s}: {v * 1e3:9.2f} ms ({100 * v / total:5.1f}%) "
                 f"x{self.counts[k]}"
                 for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(outdir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace scope; no-op when ``outdir`` is falsy."""
    if not outdir:
        yield
        return
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Metrics:
    """Per-run codec metrics (BASELINE.md metric set)."""

    images: int = 0
    pixels: int = 0
    raw_bytes: int = 0
    compressed_bytes: int = 0
    seconds: float = 0.0
    failures: int = 0
    psnr_sum: float = 0.0
    psnr_count: int = 0
    extra: Dict[str, float] = field(default_factory=dict)

    def add_image(self, h: int, w: int, nbytes: int, seconds: float,
                  psnr: Optional[float] = None) -> None:
        self.images += 1
        self.pixels += h * w
        self.raw_bytes += h * w * 3
        self.compressed_bytes += nbytes
        self.seconds += seconds
        if psnr is not None:
            self.psnr_sum += psnr
            self.psnr_count += 1

    @property
    def megapixels_per_s(self) -> float:
        return self.pixels / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def compression_ratio(self) -> float:
        return (self.raw_bytes / self.compressed_bytes
                if self.compressed_bytes else 0.0)

    def to_dict(self) -> Dict[str, float]:
        d = {
            "images": self.images,
            "megapixels": round(self.pixels / 1e6, 3),
            "seconds": round(self.seconds, 3),
            "megapixels_per_s": round(self.megapixels_per_s, 3),
            "compressed_bytes": self.compressed_bytes,
            "compression_ratio": round(self.compression_ratio, 2),
            "failures": self.failures,
        }
        if self.psnr_count:
            d["mean_psnr_db"] = round(self.psnr_sum / self.psnr_count, 2)
        d.update(self.extra)
        return d

    def json_line(self) -> str:
        return json.dumps(self.to_dict())
