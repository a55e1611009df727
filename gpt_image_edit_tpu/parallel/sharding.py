"""Parameter / activation sharding rules.

Replaces the reference's DeepSpeed-ZeRO + FSDP configs
(ref:scripts/accelerate_configs/zero{1,2,3}.json, fsdp_flux.yaml) with
NamedSharding over the (data, fsdp, tensor) mesh:

- 2-D kernels (in, out):     P(fsdp, tensor)          — ZeRO-3 + TP
- 3-D stacked-layer kernels: P(None, fsdp, tensor)    — layer axis replicated
- embeddings (V, D):         P(tensor, fsdp)          — vocab over tensor
- 1-D (biases, norm scales): replicated (small)
- conv kernels (VAE):        replicated (VAE is ~160M params, cheap)

Dims that don't divide the axis size fall back to replication on that axis —
sharding stays a pure perf knob, never a correctness constraint.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt_image_edit_tpu.parallel.mesh import AXIS_FSDP, AXIS_TENSOR, BATCH_AXES


def _axis_fits(mesh: Mesh, axis: str, dim: int) -> bool:
    return dim % mesh.shape[axis] == 0


def _spec_for(path: str, leaf: Any, mesh: Mesh) -> P:
    shape = leaf.shape
    if leaf.ndim <= 1 or leaf.size < 1 << 16:
        return P()
    if "embed_tokens" in path and leaf.ndim == 2:
        ax0 = AXIS_TENSOR if _axis_fits(mesh, AXIS_TENSOR, shape[0]) else None
        ax1 = AXIS_FSDP if _axis_fits(mesh, AXIS_FSDP, shape[1]) else None
        return P(ax0, ax1)
    if leaf.ndim == 2:
        ax0 = AXIS_FSDP if _axis_fits(mesh, AXIS_FSDP, shape[0]) else None
        ax1 = AXIS_TENSOR if _axis_fits(mesh, AXIS_TENSOR, shape[1]) else None
        return P(ax0, ax1)
    if leaf.ndim == 3:  # (layers, in, out) stacked scan blocks
        ax1 = AXIS_FSDP if _axis_fits(mesh, AXIS_FSDP, shape[1]) else None
        ax2 = AXIS_TENSOR if _axis_fits(mesh, AXIS_TENSOR, shape[2]) else None
        return P(None, ax1, ax2)
    if leaf.ndim == 4:  # conv HWIO — shard output channels on tensor if big
        ax3 = AXIS_TENSOR if _axis_fits(mesh, AXIS_TENSOR, shape[3]) else None
        return P(None, None, None, ax3)
    return P()


def _iter_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        yield path, leaf
    return


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        specs.append(NamedSharding(mesh, _spec_for(path, leaf, mesh)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Device-put params with the rule-derived shardings (ZeRO-3 analogue)."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, ndim: int, batch_size: int | None = None) -> NamedSharding:
    """Shard the leading (batch) dim over (data, fsdp); rest replicated.
    Degrades to fewer axes (or replication) when batch_size doesn't divide."""
    axes = list(BATCH_AXES)
    if batch_size is not None:
        while axes and batch_size % int(
            np.prod([mesh.shape[a] for a in axes])
        ) != 0:
            axes.pop()
    spec = P(tuple(axes) if axes else None, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
