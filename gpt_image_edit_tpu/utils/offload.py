"""Sequential component offload — pinned_host parking for param pytrees.

The TPU-native equivalent of the reference's `enable_model_cpu_offload`
(ref:app.py:177-178): component param trees are parked in the device's
`pinned_host` memory space and staged into HBM only while their pipeline
stage runs, so peak HBM is bounded by the largest single component instead
of the sum. One shared implementation backs the serving runtime (VLM, text
encoders) and the Kontext pipeline (FLUX, VAE).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp


def host_sharding(device=None) -> jax.sharding.SingleDeviceSharding:
    device = device if device is not None else jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(device, memory_kind="pinned_host")


def device_sharding(device=None) -> jax.sharding.SingleDeviceSharding:
    device = device if device is not None else jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(device)


def sync(x) -> None:
    """Barrier on `x`'s computation. On the axon tunnel block_until_ready is
    a no-op, so fetch a scalar — the repo's standard sync idiom. Used before
    staging the next component so the previous one's in-flight consumers
    finish (their buffers become freeable) before fresh HBM is committed."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


class ComponentStore:
    """pinned_host masters + per-component staged HBM copies.

    `add(name, tree)` parks a tree (no-op pass-through when disabled);
    `stage(name)` returns the device-resident copy, staging on first use;
    `evict(name)` drops the HBM copy (the host master stays).
    """

    def __init__(self, enabled: bool = True, device=None):
        self.enabled = enabled
        self._host = host_sharding(device) if enabled else None
        self._dev = device_sharding(device) if enabled else None
        self._masters: Dict[str, Any] = {}
        self._staged: Dict[str, Any] = {}
        # cumulative host->HBM staging wall time + event count per
        # component (the serving-latency breakdown: SERVING_r05 measured
        # ~18s/request of non-scan overhead; this attributes it)
        self.stage_seconds: Dict[str, float] = {}
        self.stage_counts: Dict[str, int] = {}

    def add(self, name: str, tree):
        """Park `tree` in pinned_host (returns the parked tree; when the
        store is disabled the tree is returned unchanged)."""
        if not self.enabled:
            self._masters[name] = tree
            return tree
        parked = jax.device_put(tree, self._host)
        self._masters[name] = parked
        return parked

    def master(self, name: str):
        return self._masters[name]

    def stage(self, name: str):
        if not self.enabled:
            return self._masters[name]
        if name not in self._staged:
            t0 = time.perf_counter()
            staged = jax.device_put(self._masters[name], self._dev)
            # barrier on the transfer (first+last leaf: axon's
            # block_until_ready is a no-op; scalar fetch is the sync idiom)
            # so the recorded time is the transfer, not dispatch
            leaves = jax.tree_util.tree_leaves(staged)
            if leaves:
                for leaf in (leaves[0], leaves[-1]):
                    float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))
            self.stage_seconds[name] = (
                self.stage_seconds.get(name, 0.0) + time.perf_counter() - t0
            )
            self.stage_counts[name] = self.stage_counts.get(name, 0) + 1
            self._staged[name] = staged
        return self._staged[name]

    def evict(self, name: str) -> None:
        self._staged.pop(name, None)

    def evict_all(self) -> None:
        self._staged.clear()

    @property
    def idle(self) -> bool:
        """True when no component holds an HBM copy."""
        return not self._staged

    @property
    def placement(self):
        """The pinned_host sharding (None when disabled) — hand this to
        ckpt_convert's `placement=` so weights park as they are converted
        and never transit device HBM at load time."""
        return self._host
