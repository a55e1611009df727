#!/usr/bin/env python
"""Dump the optimized TPU HLO of one full-width FLUX forward (reduced depth)
to /tmp/flux_hlo.txt for fusion-level analysis of the serving step.

Usage: python scripts/dump_hlo.py [w8a8|bf16] [ND NS]
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    mode = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    ns = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax
    import jax.numpy as jnp

    from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids

    cfg = dataclasses.replace(
        FluxConfig(), num_layers=nd, num_single_layers=ns,
        rope_dtype="bfloat16",
    )
    abstract = jax.eval_shape(lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0))
    flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
    leaves = []
    for kp, s in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        big = path.endswith("kernel") and len(s.shape) >= 2 and np.prod(s.shape) >= 1 << 22
        if big and mode == "w8a8":
            leaves.append({
                "q_w8a8": jnp.ones(s.shape, jnp.int8),
                "scale": jnp.full(s.shape[:-2] + (1, s.shape[-1]), 0.01, jnp.float32),
            })
        else:
            leaves.append(jnp.full(s.shape, 0.01, s.dtype))
    by_path = {
        tuple(getattr(k, "key", getattr(k, "idx", k)) for k in kp): leaf
        for (kp, _), leaf in zip(flat, leaves)
    }

    def _build(node, prefix=()):
        if isinstance(node, dict):
            return {kk: _build(vv, prefix + (kk,)) for kk, vv in node.items()}
        if isinstance(node, list):
            return [_build(vv, prefix + (i,)) for i, vv in enumerate(node)]
        return by_path[prefix]

    params = _build(abstract)

    b = 1
    h, w, s_txt = 128, 128, 512
    s_tgt = (h // 2) * (w // 2)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((b, 2 * s_tgt, cfg.in_channels)), jnp.bfloat16)
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)], axis=0
    )
    embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)

    def step(params, lat):
        return apply_flux(
            params, cfg,
            hidden_states=lat,
            encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.full((b,), 0.5, jnp.float32),
            img_ids=ids,
            guidance=jnp.full((b,), 3.5, jnp.float32),
        )

    lowered = jax.jit(step).lower(params, latents)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/flux_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
