"""Load the reference implementation (/root/reference) as a test oracle.

The reference targets Python 3.6 / old NumPy and depends on ``bitarray``,
neither of which exists in this environment, so we shim:
  * ``np.float`` / ``np.complex`` / ``np.int`` (removed in NumPy >= 1.24),
  * a minimal pure-Python ``bitarray`` stand-in covering the subset the
    reference uses.

Parity tests compare our codec's bytes/planes against this live oracle.
No reference code is copied into this repository.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_PATH = os.environ.get("JPEG_TPU_REFERENCE", "/root/reference")


class _BitArray:
    """Minimal bitarray-compatible shim (only what the reference uses)."""

    def __init__(self, init=None):
        if init is None:
            self._b = []
        elif isinstance(init, str):
            self._b = [c == "1" for c in init]
        elif isinstance(init, _BitArray):
            self._b = list(init._b)
        elif isinstance(init, int):
            self._b = [False] * init
        else:
            self._b = [bool(x) for x in init]

    def extend(self, other):
        self._b.extend(other._b if isinstance(other, _BitArray)
                       else (bool(x) for x in other))

    def append(self, v):
        self._b.append(bool(v))

    def __add__(self, other):
        r = _BitArray()
        r._b = self._b + other._b
        return r

    def __len__(self):
        return len(self._b)

    def __getitem__(self, i):
        if isinstance(i, slice):
            r = _BitArray()
            r._b = self._b[i]
            return r
        return self._b[i]

    def __eq__(self, other):
        return isinstance(other, _BitArray) and self._b == other._b

    def to01(self):
        return "".join("1" if x else "0" for x in self._b)

    def tobytes(self):
        bits = self._b + [False] * (-len(self._b) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | int(b)
            out.append(v)
        return bytes(out)

    def frombytes(self, data):
        for byte in data:
            for k in range(7, -1, -1):
                self._b.append(bool((byte >> k) & 1))

    def __repr__(self):
        return f"bitarray('{self.to01()}')"


_loaded = None


def available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load():
    """Import and return the reference's modules as a namespace object."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not available():
        raise RuntimeError(f"reference not found at {REFERENCE_PATH}")

    # NumPy 2.x removed these aliases the reference relies on.
    for name, alias in (("float", float), ("complex", complex), ("int", int)):
        if not hasattr(np, name):
            setattr(np, name, alias)

    if "bitarray" not in sys.modules:
        mod = types.ModuleType("bitarray")
        mod.bitarray = _BitArray
        sys.modules["bitarray"] = mod

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    ns = types.SimpleNamespace()
    import util  # noqa: E402
    import transforms  # noqa: E402
    import quantizers  # noqa: E402
    import file_format  # noqa: E402
    import pipeline  # noqa: E402
    ns.util = util
    ns.transforms = transforms
    ns.quantizers = quantizers
    ns.file_format = file_format
    ns.pipeline = pipeline
    _loaded = ns
    return ns
