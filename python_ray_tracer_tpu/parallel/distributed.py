"""Multi-host initialization and framebuffer assembly.

The reference is single-process/single-GPU (SURVEY §5: data movement is
``cuda.to_device``/``copy_to_host`` only). On a TPU pod slice, process startup goes
through ``jax.distributed.initialize`` (DCN rendezvous); after that the ``"rays"``
mesh spans every chip in the slice and the sharded renderer needs no further
host-side coordination — collectives ride ICI inside jitted computations.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-op when single-process (the common dev case)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def gather_framebuffer(image) -> np.ndarray:
    """Assemble a (possibly sharded / multi-host) device image on the local host.

    Uses ``jax.experimental.multihost_utils`` semantics via
    ``process_allgather``-free path: for single-host (addressable) arrays this is a
    plain device-to-host copy; for multi-host global arrays the per-host shards are
    fetched addressably and the caller is expected to hold the full array only on
    host 0 (PNG writing is a host-0 concern).
    """
    arr = jax.device_get(image)
    return np.asarray(arr)
