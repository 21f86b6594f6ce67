"""Multi-host execution: jax.distributed + cross-host bitstream stitch.

The reference is strictly single-process (SURVEY.md §2b).  On a multi-host
TPU slice the codec scales with the standard JAX recipe:

* ``initialize()`` wires up the distributed runtime (ICI within a slice,
  DCN across hosts) — a no-op for single-process runs.
* The coefficient path is the same global-mesh jitted program as
  :mod:`jpeg_tpu.parallel.sharded`; each host feeds its local rows via
  ``multihost_utils.host_local_array_to_global_array``.
* Entropy coding is host-local over the host's own block rows (byte-aligned
  blocks make per-host streams independently valid), then one
  ``process_allgather`` of (length, padded stream) pairs fixes the offsets
  and every host materializes the identical stitched stream.

Single-process behavior degenerates exactly to ``sharded.compress_plane``
(tested); the multi-process branches use only public collectives and are
exercised on real slices.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import entropy
from ..config import Configuration
from ..ops import band as band_ops
from . import mesh as mesh_lib
from . import sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (DCN).  Safe to skip for one process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(data: Optional[int] = None,
                band: Optional[int] = None):
    """Mesh over every device of every host (ICI + DCN)."""
    return mesh_lib.make_mesh(data=data, band=band)


def _local_block_rows(config: Configuration, nproc: int, pid: int):
    """Contiguous block-row range [lo, hi) owned by host ``pid``."""
    rows = config.blocks_high
    per = -(-rows // nproc)
    lo = min(pid * per, rows)
    return lo, min(lo + per, rows)


def compress_plane_distributed(plane, config: Configuration,
                               mesh=None) -> bytes:
    """Row-band compress across all hosts; every host returns the full
    stitched stream (bit-identical to the serial encoder's output).

    Args:
      plane: on a single process, the full (H, W) band.  On multiple
        processes, the host-local row slice (rows split by block-row range,
        ``_local_block_rows`` x block_size*dct_size image rows each).
    """
    nproc = jax.process_count()
    if mesh is None:
        mesh = global_mesh()
    if nproc == 1:
        return sharded.compress_plane(plane, config, mesh)

    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid = jax.process_index()
    # Host-local rows -> one global sharded array (no host ever holds it all).
    flat = mesh_lib.plane_sharding(mesh, (config.coeff_height * config.block_size,
                                          config.width))
    global_plane = multihost_utils.host_local_array_to_global_array(
        np.asarray(plane), flat.mesh, P(mesh_lib.BAND_AXIS, None))

    dt = np.dtype(band_ops.default_dtype())
    fn = sharded._plane_encode_fn(
        band_ops.config_key(config), dt.name, flat.mesh,
        tuple(global_plane.shape),
        sharded._mesh_pallas(flat.mesh, dt, config.transform))
    levels = fn(global_plane)

    # Host-local entropy over this host's block rows.
    lo, hi = _local_block_rows(config, nproc, pid)
    nw = config.blocks_wide
    local_levels = np.asarray(
        multihost_utils.process_allgather(levels)  # small bands; simple path
    )[lo * nw:hi * nw]
    local_stream = entropy.encode_levels(local_levels)

    # All-gather (length, padded bytes) and stitch in process order.
    lengths = multihost_utils.process_allgather(
        jnp.asarray([len(local_stream)], jnp.int32)).reshape(-1)
    cap = int(lengths.max())
    padded = np.zeros(cap, np.uint8)
    padded[:len(local_stream)] = np.frombuffer(local_stream, np.uint8)
    streams = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(padded))).reshape(nproc, cap)
    return sharded.stitch_streams(
        [streams[p, :int(lengths[p])].tobytes() for p in range(nproc)])
