"""Multi-host environment setup + host-side gathers.

TPU-native replacement for the reference's launcher shims and
pickle-tmpfile rank gathers (reference mmdet/apis/env.py:13-55 reading
RANK / OMPI_COMM_WORLD_RANK / SLURM_PROCID and setting MASTER_ADDR/PORT;
mmdet/core/evaluation/eval_hooks.py:40-79 gathering per-rank results via
pickle files + dist.barrier):

  * ``init_distributed`` wraps ``jax.distributed.initialize`` (reads the
    same scheduler env vars via jax's built-in cluster detection),
  * ``all_gather_host`` gathers host-local pytrees across processes via
    ``multihost_utils.process_allgather`` — no tmpfiles, no barriers.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  On TPU pods the arguments are
    auto-detected; SLURM/OMPI env vars are also understood natively."""
    import jax

    if num_processes is None and "SLURM_NTASKS" not in os.environ \
            and "OMPI_COMM_WORLD_SIZE" not in os.environ \
            and coordinator_address is None \
            and "COORDINATOR_ADDRESS" not in os.environ:
        # single-process: nothing to initialize
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def all_gather_host(tree):
    """Gather a host-local pytree from every process (replaces the
    reference's pickle-tmpfile + barrier collection)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()
