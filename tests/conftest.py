"""Test env: force an 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the JAX answer to 'test multi-node without a
cluster' — SURVEY.md §4).

Note: this environment exports JAX_PLATFORMS=axon (the TPU tunnel), so we
must override via jax.config, not env vars."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
