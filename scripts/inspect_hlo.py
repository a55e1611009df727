#!/usr/bin/env python
"""Dump the optimized-HLO bodies of named fusions from the full-width W8A8
FLUX step (the profile_step.py program). Use after profiling: the xplane
trace names hot ops (fusion.493, copy-start.64, ...) but not their contents;
this prints what each fused computation actually does, so perf work targets
real instructions instead of guesses.

  python scripts/inspect_hlo.py fusion.493 fusion.490 [--depth 19 38]

Compile hits the persistent .jax_cache, so this is fast once profile_step
has run."""

import dataclasses
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids
    from gpt_image_edit_tpu.utils.synthetic import quantized_shape_params

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    nd, ns = 19, 38
    if "--depth" in sys.argv:
        i = sys.argv.index("--depth")
        nd, ns = int(sys.argv[i + 1]), int(sys.argv[i + 2])

    cfg = dataclasses.replace(
        FluxConfig(), num_layers=nd, num_single_layers=ns,
        rope_dtype="bfloat16",
    )
    abstract = jax.eval_shape(
        lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0)
    )
    params = quantized_shape_params(abstract, qkey="q_w8a8", min_elems=1 << 22)

    b, h, w, s_txt = 1, 128, 128, 512
    s_tgt = (h // 2) * (w // 2)
    latents = jnp.zeros((b, 2 * s_tgt, cfg.in_channels), jnp.bfloat16)
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
        axis=0,
    )
    embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)

    def step(params, lat):
        return apply_flux(
            params, cfg, hidden_states=lat, encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.full((b,), 0.5, jnp.float32), img_ids=ids,
            guidance=jnp.full((b,), 3.5, jnp.float32),
        )

    print("lower+compile (cache-hit fast; fresh ~10 min)...", file=sys.stderr)
    compiled = jax.jit(step).lower(params, latents).compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt) / 1e6:.1f} MB", file=sys.stderr)

    if not names:
        # no names: list the fused computations with instruction counts
        for m in re.finditer(r"^%?(fused_computation[^\s(]*)", txt, re.M):
            print(m.group(1))
        return

    # Each "%fusion.N = ... fusion(...), kind=kLoop, calls=%fused_computation.M"
    # — print the call site and the called computation body.
    for name in names:
        pat = re.compile(rf"%{re.escape(name)} = .*$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"== {name}: NOT FOUND ==")
            continue
        line = m.group(0)
        print(f"== {name} call site ==\n{line[:2000]}\n")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            body = re.search(
                rf"^%?{re.escape(comp)} [^\n]*\{{\n(.*?)^\}}", txt, re.M | re.S
            )
            if body:
                print(f"-- {comp} body --")
                print(body.group(1)[:8000])


if __name__ == "__main__":
    main()
