"""Multi-host entry point (SURVEY §5.8: the reference is single-process;
the TPU build spans hosts via jax.distributed + XLA collectives).

Call `initialize()` once per host process before building meshes; all
`parallel/` code then sees the global device set and the same shard_map
programs span the pod — psum/pmax ride ICI within a slice and DCN across
hosts.  On a single host this is a no-op (jax.devices() already has every
local chip), so drivers can call it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host rendering.

    Arguments default to the standard JAX env vars / TPU auto-detection
    (on Cloud TPU pods jax.distributed.initialize() needs no arguments).
    Returns True if a multi-process runtime was initialized, False when
    running single-process (no coordinator configured — local devices only).
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_pod = "TPU_WORKER_HOSTNAMES" in os.environ or explicit
    if not on_pod:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multi_process() -> bool:
    return jax.process_count() > 1


def assemble_image(raw) -> "jax.Array":
    """Gather a row-sharded frame onto every host (final image assembly).

    Under fully-addressable single-host meshes this is a device_get away;
    across hosts it is the one all_gather of the pipeline (BASELINE:
    "all_gather for final image assembly").
    """
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return raw
    return multihost_utils.process_allgather(raw, tiled=True)
