"""ComponentStore: pinned-host parking, staging, eviction, and the
per-component staging timers that back /v1/stats' `stage_timings`
(the serving-latency breakdown for the ~18s/request non-scan overhead
measured in SERVING_r05)."""

import jax.numpy as jnp

from gpt_image_edit_tpu.utils.offload import ComponentStore


def _tree():
    return {"w": jnp.ones((8, 8), jnp.float32), "b": jnp.zeros((8,))}


class TestComponentStore:
    def test_stage_evict_roundtrip(self):
        store = ComponentStore(enabled=True)
        store.add("vlm", _tree())
        staged = store.stage("vlm")
        assert float(staged["w"][0, 0]) == 1.0
        assert not store.idle
        store.evict("vlm")
        assert store.idle

    def test_stage_timers_accumulate_once_per_staging(self):
        store = ComponentStore(enabled=True)
        store.add("flux", _tree())
        store.stage("flux")
        store.stage("flux")  # cached: no second transfer, no second count
        assert store.stage_counts == {"flux": 1}
        assert store.stage_seconds["flux"] >= 0.0
        store.evict("flux")
        store.stage("flux")  # re-stage after evict IS a new transfer
        assert store.stage_counts == {"flux": 2}

    def test_disabled_store_times_nothing(self):
        store = ComponentStore(enabled=False)
        tree = store.add("vae", _tree())
        assert store.stage("vae") is tree
        assert store.stage_seconds == {}

    def test_runtime_stage_timings_merges_stores(self):
        """UnivaRuntime.stage_timings merges the runtime store (vlm) with
        the pipeline's (flux/vae) into one breakdown dict."""
        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        rt = UnivaRuntime(tiny=True, offload=True)
        rt._store.stage("vlm")
        rt.pipe._store.stage("flux")
        t = rt.stage_timings()
        assert t["vlm"]["n"] == 1 and t["flux"]["n"] == 1
        assert t["vlm"]["s"] >= 0.0
