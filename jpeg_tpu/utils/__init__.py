"""Utilities: profiling/metrics, reference-named array helpers, jit cache."""
from . import arrays, jit_cache, profiling

__all__ = ["arrays", "jit_cache", "profiling"]
