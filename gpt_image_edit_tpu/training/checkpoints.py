"""Checkpoint save / rotate / resume via orbax.

Replaces accelerator.save_state + rotation (ref:train_denoiser.py:1190-1237)
and resume_from_checkpoint 'latest' resolution (ref :347-374). Orbax writes
each shard from its owning host — the multi-host analogue of ZeRO's
16-bit gather-on-save without the gather."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def make_manager(output_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    os.makedirs(output_dir, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
    )
    return ocp.CheckpointManager(os.path.abspath(output_dir), options=options)


def save(manager: ocp.CheckpointManager, step: int, state: Any) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(
    manager: ocp.CheckpointManager, template: Any, mesh=None
) -> Optional[tuple]:
    """Returns (step, state) or None if no checkpoint exists.

    With `mesh`, restored leaves are committed to mesh shardings (the
    template's NamedSharding where present, replicated otherwise) — restored
    arrays are device-committed, so mixing single-device restores with
    mesh-sharded params would make jit refuse the state."""
    step = manager.latest_step()
    if step is None:
        return None
    state = manager.restore(step, args=ocp.args.StandardRestore(template))
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())

        def _place(restored, tmpl):
            s = getattr(tmpl, "sharding", None)
            target = s if isinstance(s, NamedSharding) else replicated
            return jax.device_put(restored, target)

        state = jax.tree_util.tree_map(_place, state, template)
    return step, state
