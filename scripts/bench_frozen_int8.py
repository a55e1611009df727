#!/usr/bin/env python
"""Measured bf16-vs-int8 FROZEN-VLM table (VERDICT r1 #10).

Stage-2 training keeps the 7B VLM frozen while training FLUX layers; on
16GB chips the frozen weights compete with activations/optimizer state for
HBM (the reference needed 78GB/GPU, BASELINE.md). `model_config.
quantize_frozen` stores the frozen subtree int8 weight-only. This script
measures, on one real chip, the frozen LM trunk forward (the denoise_embeds
path) at FULL width (3584 hidden, GQA 28/4) and several depths:

  weight bytes | forward ms (bf16) | forward ms (int8 weight-only)

The int8 path dequantizes per-layer inside the lax.scan, so peak HBM is
int8 weights + one transient bf16 layer.
"""

import dataclasses
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

    from gpt_image_edit_tpu.models.qwen2p5vl import language
    from gpt_image_edit_tpu.models.qwen2p5vl.config import TextConfig
    from gpt_image_edit_tpu.utils.quantize import params_nbytes, quantize_params

    seq = 2048  # typical edit prompt: text + one 448^2 image (ref max_pixels)
    b = 1
    rows = []
    for depth in (4, 8):
        cfg = dataclasses.replace(TextConfig(), num_layers=depth)
        abstract = jax.eval_shape(
            lambda k: language.init(k, cfg), jax.random.key(0)
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), abstract
        )

        pos = jnp.broadcast_to(jnp.arange(seq)[None, None], (3, b, seq)).astype(jnp.int32)
        x = jnp.full((b, seq, cfg.hidden_size), 0.01, jnp.bfloat16)

        @jax.jit
        def fwd(p, x):
            return language.trunk(p, cfg, x, pos)

        def measure(p):
            out = fwd(p, x)
            float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
            t0 = time.perf_counter()
            reps = 8
            o = x
            for _ in range(reps):
                o = fwd(p, o.astype(jnp.bfloat16))
            float(jnp.sum(o.astype(jnp.float32)))
            return (time.perf_counter() - t0) / reps * 1000

        t_bf16 = measure(params)
        nb_bf16 = params_nbytes(params)

        qparams = quantize_params(params, mode="weight_only", min_size=1 << 20)
        t_int8 = measure(qparams)
        nb_int8 = params_nbytes(qparams)
        del params, qparams

        rows.append((depth, nb_bf16, t_bf16, nb_int8, t_int8))
        print(
            f"depth {depth:2d}: bf16 {nb_bf16/1e9:6.2f} GB {t_bf16:7.1f} ms | "
            f"int8 {nb_int8/1e9:6.2f} GB {t_int8:7.1f} ms "
            f"({t_int8/t_bf16:.2f}x time, {nb_int8/nb_bf16:.2f}x bytes)",
            flush=True,
        )

    # full 28-layer extrapolation (per-layer costs are uniform)
    (d1, nb1, t1, nbi1, ti1), (d2, nb2, t2, nbi2, ti2) = rows
    per_layer = ((t2 - t1) / (d2 - d1), (ti2 - ti1) / (d2 - d1))
    wb = ((nb2 - nb1) / (d2 - d1), (nbi2 - nbi1) / (d2 - d1))
    print(
        f"full 28-layer trunk estimate: bf16 {wb[0]*28/1e9:.2f} GB "
        f"{per_layer[0]*28:.0f} ms | int8 {wb[1]*28/1e9:.2f} GB "
        f"{per_layer[1]*28:.0f} ms per forward @ seq {seq}"
    )


if __name__ == "__main__":
    main()
