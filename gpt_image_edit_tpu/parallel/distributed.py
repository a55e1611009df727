"""Multi-host initialization (the NCCL/MASTER_ADDR analogue,
ref:scripts/denoiser/flux_qwen2p5vl_7b_vlm_stage1_512.sh NCCL env tuning,
ref:scripts/accelerate_configs/multi_node_example_zero*.yaml).

On TPU pods, `jax.distributed.initialize()` discovers peers from the TPU
metadata; elsewhere coordinator/num_processes/process_id come from env vars
(JAX_COORDINATOR_ADDRESS or MASTER_ADDR/PORT, WORLD_SIZE, RANK) for drop-in
compatibility with torchrun-style launchers."""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("gie_tpu.dist")

_initialized = False


def initialize(coordinator: Optional[str] = None) -> None:
    """Idempotent multi-process init. Single-process runs are a no-op.

    MUST run before any other JAX call in the process: probing
    ``jax.process_count()`` here would itself initialize the (local) backend
    and break coordination, so idempotency is tracked with a module flag and
    multi-host intent is detected purely from env vars / the argument.
    """
    global _initialized
    if _initialized:
        return
    world = int(os.environ.get("WORLD_SIZE", os.environ.get("JAX_NUM_PROCESSES", "1")))
    if coordinator is None:
        addr = os.environ.get(
            "JAX_COORDINATOR_ADDRESS",
            os.environ.get("MASTER_ADDR"),
        )
        port = os.environ.get("MASTER_PORT", "1234")
        coordinator = f"{addr}:{port}" if addr else None
    if world <= 1 and coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=world if world > 1 else None,
        process_id=int(os.environ.get("RANK", "0")) if world > 1 else None,
    )
    _initialized = True
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
