"""Multi-host bring-up: `jax.distributed.initialize` from flags/env — the
single-controller replacement for the reference's `accelerate launch`
process-group bring-up (`run_stage*.sh:4`, LOCAL_RANK plumbing
`train_stage1.py:415-417`).

On a single host this is a no-op; on a multi-host TPU slice the runtime
usually auto-detects (TPU metadata), so explicit coordinates are only needed
for CPU/GPU clusters or non-standard launches."""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger("rcdms_tpu.distributed")


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when multi-host coordinates are available
    (flags take precedence over JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars). Safe to call on a single host (no-op)."""
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return  # single-host / auto-detected TPU slice
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    except RuntimeError as e:
        # Only an ALREADY-initialized cluster is benign. The other
        # RuntimeError here — 'must be called before ... XLA backend' —
        # means some import touched the backend first; swallowing it would
        # silently degrade the launch to N independent single-process
        # trainings (each host shard_id=0, no gradient sync).
        if "already" in str(e).lower():
            logger.info("jax.distributed already initialized: %s", e)
        else:
            raise RuntimeError(
                "jax.distributed.initialize failed because the XLA "
                "backend was already initialized by an earlier import — "
                "multi-host training would silently run as independent "
                "single-host jobs. Fix the premature jax call (no "
                "module-level PRNGKeys/device queries in CLI imports)."
            ) from e
