"""Multi-host bring-up for pod-scale deployments.

The reference is single-process (SURVEY.md §2 "distributed communication
backend: none"); the TPU-native scaling axis is frame/stream data
parallelism over a ``Mesh`` (``parallel/mesh.py``).  On a multi-host pod
slice that mesh spans processes: each host runs the same program, JAX's
distributed runtime exchanges device topology once at startup, and every
collective in ``whole_limb_step`` / ``BatchedForce`` rides ICI exactly as
in the single-host case — no NCCL/MPI-style code appears anywhere.

Typical bring-up on each host::

    from vistaf_tpu.parallel.distributed import initialize_multihost
    initialize_multihost()                  # no-op single-process
    mesh = make_stream_mesh()               # now spans all hosts' chips

Controller-less: coordinator address/process counts come from the standard
JAX env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID)
or the TPU metadata on Cloud TPU pods, mirroring jax.distributed.initialize
semantics.
"""
from __future__ import annotations

import os
from typing import Optional


def _env_int(name: str) -> Optional[int]:
    """Integer env var, or None when unset/malformed (malformed values are
    ignored rather than crashing bring-up on every host)."""
    v = os.environ.get(name, "").strip()
    if not v:
        return None
    try:
        return int(v)
    except ValueError:
        return None


def is_multihost_env() -> bool:
    """True when the standard JAX multi-process env contract is present."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    n = _env_int("JAX_NUM_PROCESSES")
    return bool(n and n > 1)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` when (and only when) a multi-process
    environment is configured; a safe no-op otherwise.

    Returns True if the distributed runtime was initialized.  Explicit
    arguments override the env contract.  Idempotent: a second call (or a
    call after the runtime is already up) is a no-op.
    """
    import jax

    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    if not explicit and not is_multihost_env():
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=(num_processes if num_processes is not None
                           else _env_int("JAX_NUM_PROCESSES")),
            process_id=(process_id if process_id is not None
                        else _env_int("JAX_PROCESS_ID")),
        )
        return True
    except RuntimeError as e:
        # already initialized — idempotent bring-up.  jax 0.9.0 phrases
        # this as "distributed.initialize should only be called once."
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return True
        raise


def global_stream_count() -> int:
    """Total streams the pod can carry at one frame per chip."""
    import jax
    return jax.device_count()
