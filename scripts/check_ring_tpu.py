#!/usr/bin/env python
"""One-chip validation that the composed pallas-under-shard_map ring flash
hop LOWERS AND RUNS on real TPU Mosaic (the 8-shard CP tests are CPU-mesh
or skipped; multi-chip hardware is not available in this environment).

A 1-device `sequence` mesh is a degenerate ring (one hop, identity
ppermute) but exercises every on-hardware piece the pod path needs: the
flash kernel tracing inside a shard_map body, out_vma plumbing through
pallas_call, the Mosaic lowering of the padded (1088 -> 1152) CP shard
shape, and the custom-VJP backward kernels under shard_map.

Logs a `ring_tpu_1dev` row on success.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from gpt_image_edit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from gpt_image_edit_tpu.ops.ring_attention import context_parallel_attention
    from gpt_image_edit_tpu.ops.attention import dot_product_attention

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    on_tpu = dev.platform == "tpu"

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1, 1),
                ("data", "fsdp", "tensor", "sequence"))
    b, s, h, d = 1, 1088, 8, 128  # the real CP shard shape (8704 / 8)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
               for _ in range(3))

    # CPU smoke runs jnp hops (the pallas interpreter cannot lower inside
    # a partial-manual shard_map — JAX vma check; the real-kernel CPU
    # composition is covered by the full-manual test in
    # tests/test_ring_attention.py); TPU runs the real Mosaic kernels.
    hop = "flash" if on_tpu else "jnp"
    t0 = time.perf_counter()
    out = context_parallel_attention(q, k, v, mesh=mesh, hop_impl=hop)
    float(jnp.sum(out.astype(jnp.float32)))
    t_fwd = time.perf_counter() - t0
    ref = dot_product_attention(q, k, v, impl="xla")
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"fwd compile+run {t_fwd:.1f}s, maxdiff vs xla {err:.4f}",
          file=sys.stderr)
    assert err < 0.05, err

    t0 = time.perf_counter()
    dq = jax.grad(lambda q: jnp.sum(context_parallel_attention(
        q, k, v, mesh=mesh, hop_impl=hop,
    ).astype(jnp.float32) ** 2))(q)
    g = float(jnp.sum(jnp.abs(dq.astype(jnp.float32))))
    t_bwd = time.perf_counter() - t0
    assert np.isfinite(g), g
    print(f"bwd compile+run {t_bwd:.1f}s, sum|dq|={g:.1f}", file=sys.stderr)

    if on_tpu:
        import bench

        bench._log_experiment(
            "ring_tpu_1dev", shard=s, heads=h, head_dim=d,
            t_fwd_s=round(t_fwd, 1), t_bwd_s=round(t_bwd, 1),
            maxdiff=round(err, 5),
        )
    print("ring flash hop on TPU shard_map: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
