"""Multi-host initialisation (DCN scaling, SURVEY.md section 2.3).

The single-host programs in this framework scale to multi-host slices
unchanged: call ``init_multihost()`` before first JAX use on every host,
then build meshes over ``jax.devices()`` as usual — XLA routes
collectives over ICI within a slice and DCN across hosts. This is the
rebuild's entire "distributed backend": there is no NCCL/MPI-equivalent
user surface by design.
"""

from __future__ import annotations

import os


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialise jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True
    if multi-host mode was initialised, False for single-host runs."""
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator_address:
        return False
    # `is None` (not falsy-or): an explicit process_id=0 must never be
    # silently replaced by the env var.
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """Whether this host should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
