"""Multi-host process-group init + deterministic per-host PRNG derivation.

SURVEY.md §2.4: equivalent of the reference genre's (absent) NCCL/MPI layer.
jax.distributed.initialize() discovers the process topology over DCN; the
('snr','data') mesh then spans hosts, and the only cross-host traffic is the
per-step counter reduction, which XLA lowers to a psum over ICI/DCN.

Determinism contract (SURVEY.md §5.2): results must be invariant to mesh
shape and process count. That is achieved by deriving frame batches from a
*global* key by (snr index, macro-batch index) — never from process index —
so the same total frame set is simulated regardless of layout; per-host key
derivation is provided only for explicitly host-local streams.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX process group (no-op for single-process runs).

    Arguments fall back to the standard env vars used by TPU slices
    (auto-detected by jax.distributed) or NBLDPC_COORDINATOR / NBLDPC_NUM_PROCS
    / NBLDPC_PROC_ID for manual CPU multi-process tests (SURVEY.md §4.6).
    """
    coordinator_address = coordinator_address or os.environ.get("NBLDPC_COORDINATOR")
    if num_processes is None and "NBLDPC_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["NBLDPC_NUM_PROCS"])
    if process_id is None and "NBLDPC_PROC_ID" in os.environ:
        process_id = int(os.environ["NBLDPC_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        # Auto-initialize ONLY when the environment clearly indicates a
        # multi-process slice: a bare jax.distributed.initialize() on a
        # single-chip box can block waiting for a coordinator that will
        # never answer.
        multiproc_env = any(
            v in os.environ
            for v in (
                "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES",
                "CLOUD_TPU_TASK_ID",
            )
        )
        if not multiproc_env:
            return  # single-process local run
        if jax.process_count() > 1:
            return  # already initialized by the runtime
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def host_local_key(key, stream: str = "local"):
    """Fold the process index into a key — ONLY for host-local streams."""
    import jax.random as jr

    return jr.fold_in(jr.fold_in(key, hash(stream) % (2**31)), jax.process_index())
