#!/usr/bin/env python
"""Per-kernel-type W8A8 sensitivity sweep on the tiny e2e denoise scan.

VERDICT r2 #4: the W8A8 serving config measured ~1.3% per-forward error vs
fp32 against a <=1% budget (BASELINE.json "<=1% per-pixel MAE"). Mixed-
precision plan: every big kernel stays int8 in HBM, but the most
quantization-sensitive kernel TYPES run weight-only (bf16 activations x
dequantized weights) instead of int8xint8 on the MXU. This script ranks the
types by e2e error contribution and evaluates demotion sets.

Kernel-type groups mirror the FULL-scale quantization set (kernels >= 1M
elements at 3072 width), applied to the tiny config by path so tiny results
transfer structurally. Run on CPU (JAX_PLATFORMS=cpu): error is backend-
independent; speed is measured separately on TPU by scripts/profile_step.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# kernel paths quantized at FULL scale (>= 1M elements at width 3072),
# grouped by type. Tiny mirrors this set via path matching.
GROUPS = {
    "modulation": ("norm1/linear", "norm1_context/linear", "single_blocks/norm/linear"),
    "dual_qkv": ("attn/to_q", "attn/to_k", "attn/to_v",
                 "attn/add_q_proj", "attn/add_k_proj", "attn/add_v_proj"),
    "attn_out": ("attn/to_out", "attn/to_add_out"),
    "dual_ff": ("ff/in", "ff/out", "ff_context/in", "ff_context/out"),
    "single_qkv": ("single_blocks/attn/to_q", "single_blocks/attn/to_k",
                   "single_blocks/attn/to_v"),
    "single_mlp": ("single_blocks/proj_mlp", "single_blocks/proj_out"),
    "embedders": ("context_embedder", "time_in/out", "guidance_in/out",
                  "pooled_in/in", "pooled_in/out"),
}
ALL_PATTERNS = tuple(p for ps in GROUPS.values() for p in ps)


def group_of(path: str):
    # single_blocks/attn/* must win over the dual attn/* patterns
    for name in ("single_qkv", "single_mlp", "modulation"):
        if any(p in path for p in GROUPS[name]):
            return name
    for name, pats in GROUPS.items():
        if any(p in path for p in pats):
            return name
    return None


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
    from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
    from gpt_image_edit_tpu.models.vae.model import decode_from_scaled_latents
    from gpt_image_edit_tpu.ops.packing import latent_image_ids
    from gpt_image_edit_tpu.pipeline.kontext import denoise_scan
    from gpt_image_edit_tpu.pipeline.scheduler import flow_sigmas
    from gpt_image_edit_tpu.utils.quantize import quantize_params

    steps = 28
    h = w = 16
    s_txt = 32
    b = 1

    cfg32 = FluxConfig.tiny()  # fp32 reference
    cfg_srv = dataclasses.replace(cfg32, rope_dtype="bfloat16")  # serving
    params32 = init_flux(jax.random.key(0), cfg32)
    vcfg = VaeConfig.tiny()
    vae = init_vae(jax.random.key(3), vcfg)

    s_tgt = (h // 2) * (w // 2)
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, s_tgt, cfg32.in_channels)),
        jnp.float32,
    )
    image_latents = latents * 0.5
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
        axis=0,
    )
    embeds = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (b, s_txt, cfg32.joint_attention_dim)) * 0.1,
        jnp.float32,
    )
    pooled = jnp.zeros((b, cfg32.pooled_projection_dim), jnp.float32)
    sigmas = jnp.asarray(flow_sigmas(steps, s_tgt))
    guidance = jnp.full((b,), 3.5, jnp.float32)

    def scan(params, cfg, dtype):
        return denoise_scan(
            params, cfg,
            latents=latents.astype(dtype),
            image_latents=image_latents.astype(dtype),
            latent_ids=ids,
            prompt_embeds=embeds.astype(dtype),
            pooled_embeds=pooled.astype(dtype),
            sigmas=sigmas, guidance=guidance, num_steps=steps,
        )

    ref = scan(params32, cfg32, jnp.float32).astype(jnp.float32)
    img_ref = decode_from_scaled_latents(
        vae, vcfg,
        ref.reshape(b, h // 2, w // 2, cfg32.in_channels)[..., : vcfg.latent_channels],
    )

    def measure(mode_for, label):
        p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params32
        )
        qp = quantize_params(p, min_size=0, mode_for=mode_for,
                             path_filter=lambda s: any(t in s for t in ALL_PATTERNS))
        out = scan(qp, cfg_srv, jnp.bfloat16).astype(jnp.float32)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        img = decode_from_scaled_latents(
            vae, vcfg,
            out.reshape(b, h // 2, w // 2, cfg32.in_channels)[..., : vcfg.latent_channels],
        )
        mae = float(jnp.mean(jnp.abs(img - img_ref))) / 2.0  # [-1,1] -> frac
        print(f"{label:42s} rel-L2 {rel * 100:6.3f}%   img MAE {mae * 100:6.3f}%",
              flush=True)
        return rel, mae

    # baselines
    measure(lambda s: None, "bf16 only (no quant)")
    measure(lambda s: "weight_only", "all weight-only")
    measure(lambda s: "w8a8", "all W8A8 (current serving)")

    # single-group W8A8 (everything else fp/bf16): sensitivity ranking
    print("\n-- one group W8A8 at a time --")
    sens = {}
    for name in GROUPS:
        rel, mae = measure(
            lambda s, n=name: "w8a8" if group_of(s) == n else None,
            f"only {name} w8a8",
        )
        sens[name] = rel

    # demotion sets: all w8a8 except listed groups -> weight_only
    print("\n-- demotion candidates (group -> weight-only, rest W8A8) --")
    ranked = sorted(sens, key=sens.get, reverse=True)
    print("sensitivity ranking:", ranked)
    for k in range(1, len(ranked) + 1):
        demote = set(ranked[:k])
        rel, mae = measure(
            lambda s, d=demote: "weight_only" if group_of(s) in d else "w8a8",
            f"demote {'+'.join(sorted(demote))}",
        )
        if rel < 0.01 and mae < 0.01:
            print(f"  -> under 1% with {k} demoted group(s)")
            break

    if "--int4" in sys.argv:
        # int4 memory mode: rank per-group 4-bit sensitivity and find the
        # smallest promotion set (worst groups back to int8) that pulls the
        # e2e error toward the int8 level at near-int4 memory
        print("\n-- int4 sensitivity (one group int4, rest weight-only int8) --")
        measure(lambda s: "int4", "all int4")
        sens4 = {}
        for name in GROUPS:
            rel, mae = measure(
                lambda s, n=name: "int4" if group_of(s) == n else "weight_only",
                f"only {name} int4",
            )
            sens4[name] = rel
        ranked4 = sorted(sens4, key=sens4.get, reverse=True)
        print("int4 sensitivity ranking:", ranked4)
        print("\n-- promotion candidates (group -> int8, rest int4) --")
        for k in range(1, len(ranked4) + 1):
            promote = set(ranked4[:k])
            rel, mae = measure(
                lambda s, d=promote: (
                    "weight_only" if group_of(s) in d else "int4"
                ),
                f"promote {'+'.join(sorted(promote))}",
            )
            if mae < 0.005:
                print(f"  -> under 0.5% px MAE with {k} promoted group(s)")
                break


if __name__ == "__main__":
    main()
