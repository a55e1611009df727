#!/usr/bin/env python
"""Microbench the ring-attention flash hop at the CP serving shard shape
(VERDICT r4 #5): per-hop `flash_attention_lse` at the padded CP shard
(8704/8 = 1088 -> 1152, block 384) vs the single-chip `flash_attention`
kernel at the same shape, plus the jnp blocked hop it replaces.

The real CP deployment runs N hops of this kernel per attention (one per
ring position), each overlapped with the ppermute of the next K/V shard —
so per-hop kernel time is the compute floor of CP attention. Run on the
TPU; logs a `ring_hop` row to bench_experiments.jsonl.

Usage: python scripts/bench_ring_hop.py [--shard 1088] [--heads 24]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", type=int, default=1088,
                    help="CP shard length (8704/8 for the serving shape)")
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from gpt_image_edit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from gpt_image_edit_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_lse,
    )
    from gpt_image_edit_tpu.ops.ring_attention import _FlashPlan

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    interp = not on_tpu
    print(f"device: {dev}")

    b, s, h, d = 1, args.shard, args.heads, args.head_dim
    plan = _FlashPlan(s, s, 512)
    print(f"shard {s} -> q pad {plan.sq_pad} (block {plan.bq}), "
          f"kv pad {plan.skv_pad} (block {plan.bkv})")

    rng = np.random.default_rng(0)
    if not on_tpu:  # keep the CPU smoke tiny
        b, s, h, d = 1, 136, 2, 64
        plan = _FlashPlan(s, s, 512)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    # padded hop inputs exactly as ring_attention builds them
    q = mk((b, plan.sq_pad, h, d))
    k = mk((b, plan.skv_pad, h, d))
    v = mk((b, plan.skv_pad, h, d))
    pm = jnp.asarray(np.arange(plan.skv_pad) < s, bool)[None].repeat(b, 0)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))  # axon: block is a no-op

    def time_fn(fn, *xs):
        out = fn(*xs)
        sync(out[0] if isinstance(out, tuple) else out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*xs)
            sync(out[0] if isinstance(out, tuple) else out)
            best = min(best, time.perf_counter() - t0)
        return best

    hop = jax.jit(lambda q, k, v, pm: flash_attention_lse(
        q, k, v, pad_mask=pm, block_q=plan.bq, block_kv=plan.bkv,
        interpret=interp))
    t_hop = time_fn(hop, q, k, v, pm)

    # single-chip kernel at the same padded shape (the non-CP baseline the
    # per-hop cost is compared against; same blocks, no LSE write)
    single = jax.jit(lambda q, k, v, pm: flash_attention(
        q, k, v, pad_mask=pm, block_q=plan.bq, block_kv=plan.bkv,
        interpret=interp))
    t_single = time_fn(single, q, k, v, pm)

    # the jnp blocked hop the flash hop replaces (what r4 CP actually ran)
    def jnp_hop(q, k, v, pm):
        s_ = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d ** -0.5)
        s_ = jnp.where(pm[:, None, None, :], s_, -1e30)
        p = jax.nn.softmax(s_, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)

    t_jnp = time_fn(jax.jit(jnp_hop), q, k, v, pm)

    print(f"flash hop (out+lse): {t_hop * 1e3:.2f} ms")
    print(f"single-chip flash  : {t_single * 1e3:.2f} ms "
          f"(lse overhead {100 * (t_hop / t_single - 1):+.1f}%)")
    print(f"jnp hop (materialized scores): {t_jnp * 1e3:.2f} ms "
          f"({t_jnp / t_hop:.2f}x the flash hop)")

    if on_tpu:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        bench._log_experiment(
            "ring_hop", shard=s, sq_pad=plan.sq_pad, bq=plan.bq,
            heads=h, head_dim=d, t_hop_s=round(t_hop, 5),
            t_single_s=round(t_single, 5), t_jnp_hop_s=round(t_jnp, 5),
        )


if __name__ == "__main__":
    main()
