"""Multi-host initialisation and synchronisation.

Equivalent of the reference's ``torch.distributed`` plumbing
(fruit_pipeline.py:100-121: world_size/local_rank threading +
``dist.barrier``; SURVEY §5.8).  On TPU pods: ``jax.distributed.initialize``
on every host of the slice; each host's input pipeline feeds only its local
shard of the ray batch (the per-rank datamanager contract); barriers via
``sync_global_devices``.
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed.  On TPU pod slices all arguments are
    auto-detected from the environment; arguments are for manual/CPU setups."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def barrier(name: str = "barrier") -> None:
    """Global device barrier (≙ dist.barrier, fruit_pipeline.py:121)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed ray batch this host should produce
    (per-host input pipelines feed only their local shard)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
