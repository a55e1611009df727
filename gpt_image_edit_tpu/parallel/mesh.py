"""Device mesh construction.

The reference's distributed story is NCCL data-parallel + ZeRO
(SURVEY.md §2.4). The TPU-native equivalent is one logical mesh with three
axes and XLA collectives over ICI:

- data:     pure data parallelism (DP replicas)
- fsdp:     data parallelism + parameter/optimizer sharding (ZeRO-3 analogue)
- tensor:   tensor parallelism (Megatron-style sharded matmuls)
- sequence: RESERVED for sequence/context parallelism (size 1 today —
  SURVEY §5: long-sequence efficiency comes from the flash kernel, but the
  mesh keeps the axis available so sharding the token dim later needs no
  re-plumbing; a size-1 axis is free under GSPMD)

Batches are sharded over (data, fsdp); parameters over (fsdp, tensor).
Under GSPMD any assignment is *correct* — the mesh only steers where
collectives happen, so they ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXIS_SEQUENCE = "sequence"
MESH_AXES = (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR, AXIS_SEQUENCE)
# activation batch dim is sharded over both DP-ish axes
BATCH_AXES = (AXIS_DATA, AXIS_FSDP)


def mesh_shape_for(n_devices: int, tensor: Optional[int] = None) -> Tuple[int, int, int]:
    """Pick a (data, fsdp, tensor) factorization for n devices.

    Default policy: a modest tensor axis (2 when even, else 1) for the
    19B-param model path, remainder to fsdp, data=1 unless there's room.
    """
    if tensor is None:
        tensor = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    rest = n_devices // tensor
    data = 2 if rest % 2 == 0 and rest >= 4 else 1
    fsdp = rest // data
    assert data * fsdp * tensor == n_devices, (data, fsdp, tensor, n_devices)
    return data, fsdp, tensor


def build_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = mesh_shape_for(n_devices)
    if len(shape) == len(MESH_AXES) - 1:
        shape = tuple(shape) + (1,)  # reserved sequence axis, size 1
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, MESH_AXES)


def mesh_from_arg(arg: Optional[str]) -> Optional[Mesh]:
    """CLI-flag mesh parser for serving entry points.

    None/"" -> None (single-device), "auto" -> all visible devices with the
    default factorization, "dp,fsdp,tp" (e.g. "1,4,2") -> that shape.
    """
    if not arg:
        return None
    if arg == "auto":
        return build_mesh()
    try:
        shape = tuple(int(x) for x in arg.split(","))
    except ValueError as e:
        raise ValueError(
            f"--mesh must be 'auto' or 'dp,fsdp,tp' integers, got {arg!r}"
        ) from e
    if len(shape) != 3:
        raise ValueError(f"--mesh needs 3 axes (dp,fsdp,tp), got {arg!r}")
    if any(x < 1 for x in shape):
        # numpy reshape would treat -1 as a wildcard and silently build a
        # wrong-shaped mesh; 0 builds an empty one that fails much later
        raise ValueError(f"--mesh axes must be positive integers, got {arg!r}")
    n = int(np.prod(shape))
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(
            f"--mesh {arg!r} needs {n} devices but only {avail} are visible"
        )
    return build_mesh(n, shape=shape)
