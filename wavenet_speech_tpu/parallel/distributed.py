"""Multi-host initialization and helpers (new vs the reference's strictly
single-process design — SURVEY.md §2.7).

Standard JAX multi-host flow: every host calls initialize() (coordinator
address from env or args), builds the SAME global mesh over
jax.devices() (all chips across hosts), feeds per-host batch shards, and
jit inserts psum/all-gather collectives over ICI within a slice and DCN
across hosts. Checkpointing via training/checkpoint.py is already
multi-host-safe (Orbax coordinates writes).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process (no coordinator configured)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    kw = {}
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(coordinator_address, **kw)


def is_primary() -> bool:
    """True on the host that should write checkpoints metadata / logs."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should feed (even split over
    processes)."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
