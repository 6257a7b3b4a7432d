"""Multi-host bootstrap: the TPU-native replacement for the reference's
NCCL/SLURM process-group initialization (utils/__init__.py:124-176).

On TPU pods, ``jax.distributed.initialize()`` autodetects everything from
the TPU metadata. For CPU/GPU clusters (or forced configs), coordinator
address / process counts come from the same env conventions the reference
supports (torchrun-style RANK/WORLD_SIZE/MASTER_ADDR or SLURM_*).
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX if needed; returns topology info.

    Single-process (the common dev case) is a no-op. Env fallbacks:
      RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT   (torchrun style)
      SLURM_PROCID / SLURM_NTASKS / SLURM_STEP_NODELIST (SLURM style)
    """
    import jax

    env = os.environ
    if process_id is None:
        if "RANK" in env:
            process_id = int(env["RANK"])
            num_processes = num_processes or int(env.get("WORLD_SIZE", 1))
            coordinator = coordinator or (
                f"{env.get('MASTER_ADDR', 'localhost')}:"
                f"{env.get('MASTER_PORT', '1234')}")
        elif "SLURM_PROCID" in env:
            process_id = int(env["SLURM_PROCID"])
            num_processes = num_processes or int(env.get("SLURM_NTASKS", 1))
            node = env.get("SLURM_STEP_NODELIST", "localhost").split(",")[0]
            coordinator = coordinator or f"{node}:1234"

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "is_primary": jax.process_index() == 0,
    }
