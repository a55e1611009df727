#!/usr/bin/env python
"""Measure the flash-attention kernel variants at the MMDiT serving shape.

Reports ms/call, effective TFLOP/s, and max relative output error vs the
fp32 XLA reference for: bf16 (shipping), qk8 (int8 QK^T, bf16 PV), int8
(full int8, opt-in), with and without a kv pad mask.

Usage: python scripts/bench_attention.py [--seq 8704] [--heads 24] [--d 128]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from jax.sharding import Mesh

    from gpt_image_edit_tpu.ops.pallas.flash_attention import (
        flash_attention,
        flash_attention_int8,
        flash_attention_qk8,
    )
    from gpt_image_edit_tpu.ops.ring_attention import context_parallel_attention

    # single-device "ring": one hop over the full sequence == the blocked
    # per-hop attention of ops/ring_attention.py at the flash kernel's shape
    # (VERDICT r2 #6 microbench)
    ring_mesh = Mesh(np.array(jax.devices()[:1]), ("sequence",))

    def ring_hop(q, k, v, pad_mask=None):
        return context_parallel_attention(
            q, k, v, mesh=ring_mesh, pad_mask=pad_mask
        )

    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    b, s, h, d = 1, arg("--seq", 8704), arg("--heads", 24), arg("--d", 128)
    rng = np.random.default_rng(0)
    # RMS-normalized-ish q/k (the realistic case: FLUX applies qk_norm)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    pad = jnp.asarray(np.ones((b, s), bool)).at[:, -128:].set(False)

    def ref(q, k, v, pm=None):
        # host-side, head-by-head: the full (h, s, s) f32 logits tensor OOMs
        # the 16GB chip at the serving shape
        qn, kn, vn = (np.asarray(x, np.float32) for x in (q, k, v))
        out = np.zeros_like(qn)
        for bi in range(b):
            for hi in range(h):
                lg = (qn[bi, :, hi] @ kn[bi, :, hi].T) * (d ** -0.5)
                if pm is not None:
                    lg = np.where(np.asarray(pm)[bi][None, :], lg, -1e30)
                lg -= lg.max(axis=-1, keepdims=True)
                p = np.exp(lg)
                p /= p.sum(axis=-1, keepdims=True)
                out[bi, :, hi] = p @ vn[bi, :, hi]
        return out

    flops = 4 * b * h * s * s * d

    def bench(name, fn, *args, **kw):
        f = jax.jit(lambda *a: fn(*a, **kw))
        out = f(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # sync (axon: block_until_ready no-ops)
        n = 20
        t0 = time.perf_counter()
        o = None
        for _i in range(n):
            o = f(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        return name, dt * 1e3, flops / dt / 1e12, out

    rows = []
    cache = f"/tmp/attn_ref_{s}_{h}_{d}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        r_nomask, r_mask = z["nomask"], z["mask"]
    else:
        r_nomask = np.asarray(ref(q, k, v))
        r_mask = np.asarray(ref(q, k, v, pad))
        np.savez(cache, nomask=r_nomask, mask=r_mask)
    scale_ref = np.abs(r_nomask).max()

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    for name, fn, kw, masked in [
        ("bf16",        flash_attention,       {}, False),
        ("bf16+pad",    flash_attention,       {"pad_mask": pad}, True),
        ("qk8",         flash_attention_qk8,   {}, False),
        ("qk8+pad",     flash_attention_qk8,   {"pad_mask": pad}, True),
        ("int8",        flash_attention_int8,  {}, False),
        ("int8+pad",    flash_attention_int8,  {"pad_mask": pad}, True),
        ("ringhop",     ring_hop,              {}, False),
        ("ringhop+pad", ring_hop,              {"pad_mask": pad}, True),
    ]:
        if only and not any(name.startswith(o) for o in only):
            continue
        nm, ms, tf, out = bench(name, fn, q, k, v, **kw)
        r = r_mask if masked else r_nomask
        valid = r if not masked else r  # all queries remain valid (kv-side mask)
        err = np.abs(np.asarray(out, np.float32) - r).max() / scale_ref
        rows.append((nm, ms, tf, err))
        print(f"{nm:10s} {ms:8.2f} ms  {tf:7.1f} TF/s  max-rel-err {err:.4f}")

    return rows


if __name__ == "__main__":
    main()
