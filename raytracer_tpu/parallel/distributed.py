"""Multi-host runtime initialization.

The reference's 'distributed backend' is Win32 events + one interlocked counter
(WorkerThread.cpp:8-23; SURVEY.md 5.8).  The TPU-native equivalent is
``jax.distributed`` over ICI/DCN with XLA-compiled collectives; this wrapper makes
single-host runs (and the virtual CPU mesh) a no-op so the same entry points work
everywhere.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Initialize the multi-host runtime if the environment calls for it.

    Returns the process index (0 on single-host).  Reads the standard JAX cluster
    env vars when arguments are omitted; silently stays single-process when neither
    arguments nor env are present.
    """
    global _initialized
    if _initialized:
        return jax.process_index()
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if coordinator and n > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    _initialized = True
    return jax.process_index()


def global_mesh(shape=None, axis_names=("dp", "sp")):
    """Mesh over ALL processes' devices (multi-host) or local devices."""
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n
    return Mesh(np.array(devices).reshape(shape), axis_names)
