"""Multi-host (multi-process) initialization — the SPMD entry point.

The reference is strictly single-process (SURVEY.md §2.4: no NCCL/MPI/Gloo,
no multi-node code anywhere); this module is the TPU-native scale-out story:
one Python process per host, ``jax.distributed.initialize`` wires them into a
single JAX runtime, and every mesh built by :func:`make_mesh` then spans the
global device set automatically (collectives ride ICI within a slice and DCN
across slices — XLA inserts them from sharding annotations, so nothing else
in the framework changes on multi-host).

Usage from any training/eval script::

    from openglottal_tpu.parallel import initialize_distributed, make_mesh
    initialize_distributed()          # no-op on single host
    mesh = make_mesh()                # spans all hosts' devices

On Cloud TPU pods the coordinator address / process count / process id are
discovered from the TPU metadata environment and every argument may stay
``None``; other clusters pass them explicitly or via the standard
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
environment variables.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Join the multi-host JAX runtime; safe no-op when single-process.

    Returns True when running multi-host (more than one process), False for
    the ordinary single-host case.  Idempotent: repeated calls don't
    re-initialize.
    """
    global _initialized

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    # Single host, nothing configured: plain local runtime.  (On TPU pods the
    # metadata service supplies everything, so explicit None args are fine —
    # but only call initialize when the environment actually asks for it.)
    multi = (coordinator_address is not None or num_processes not in (None, 1)
             or os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not multi:
        return False

    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_count() > 1


def process_index() -> int:
    """This host's process id (0 on single host); use to gate host-side IO
    (checkpoint writes, result JSONs) to one writer."""
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should own host-side side effects."""
    return jax.process_index() == 0
