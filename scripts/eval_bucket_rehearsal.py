#!/usr/bin/env python
"""Eval-generation rehearsal at scale (VERDICT r4 #8): time the 28-step
denoise scan + VAE decode at several of the 17 Kontext aspect buckets with
synthetic full-size W8A8 weights — per-bucket compile time, steady-state
per-image time, and an imgs/hour projection for a full ImgEdit sweep
(ref:univa/eval/imgedit/step1_gen_samples.py:122-135 generates one image
per sample across aspect-bucketed inputs; this measures what that sweep
costs per bucket on one v5e chip).

Each odd-aspect bucket exercises the ragged flash-attention path (block
pick + tail padding) at a different joint sequence length — the compile
and pad overheads this records are exactly what an eval sweep pays.

Usage: python scripts/eval_bucket_rehearsal.py [--buckets 3] [--steps 28]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, default=3)
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from gpt_image_edit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    import bench
    from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids
    from gpt_image_edit_tpu.pipeline.kontext import (
        PREFERRED_KONTEXT_RESOLUTIONS, denoise_scan,
    )
    from gpt_image_edit_tpu.pipeline.scheduler import flow_sigmas

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", file=sys.stderr)

    # square + the two most-stretched buckets: maximally different joint
    # sequence lengths (ragged flash path picks different blocks/padding)
    table = sorted(PREFERRED_KONTEXT_RESOLUTIONS, key=lambda wh: wh[0] / wh[1])
    chosen = [(1024, 1024), table[0], table[-1], table[len(table) // 4]]
    chosen = chosen[: args.buckets]

    if on_tpu:
        cfg = dataclasses.replace(
            FluxConfig(), num_layers=19, num_single_layers=38,
            rope_dtype="bfloat16",
        )
        abstract = jax.eval_shape(
            lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0)
        )
        params = bench._int8_shape_params(jax, jnp, abstract, qkey="q_w8a8")
        s_txt = 512
    else:  # CPU smoke
        cfg = FluxConfig.tiny()
        params = init_flux(jax.random.key(0), cfg)
        s_txt = 32

    rows = []
    for w_px, h_px in chosen:
        if not on_tpu:
            w_px, h_px = 32, 32
        hl, wl = h_px // 16, w_px // 16      # latent grid (VAE /8, packed /2)
        s_tgt = hl * wl
        lat = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, s_tgt, cfg.in_channels)
            ), jnp.bfloat16,
        )
        ids = jnp.concatenate(
            [latent_image_ids(hl, wl, 0), latent_image_ids(hl, wl, 1)], axis=0
        )
        embeds = jnp.zeros((1, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((1, cfg.pooled_projection_dim), jnp.bfloat16)
        sigmas = jnp.asarray(flow_sigmas(args.steps, s_tgt))
        guid = jnp.full((1,), 3.5, jnp.float32)

        def call(x):
            return denoise_scan(
                params, cfg, latents=x, image_latents=x * 0.5,
                latent_ids=ids, prompt_embeds=embeds, pooled_embeds=pooled,
                sigmas=sigmas, guidance=guid, num_steps=args.steps,
            )

        joint = s_txt + 2 * s_tgt
        t0 = time.perf_counter()
        out = call(lat)
        float(jnp.sum(out.astype(jnp.float32)))
        t_compile = time.perf_counter() - t0

        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = call(out)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)

        rows.append((w_px, h_px, joint, t_compile, best))
        print(f"bucket {w_px}x{h_px}: joint seq {joint}, compile "
              f"{t_compile:.1f}s, scan {best:.2f}s/img "
              f"({3600 / best:.0f} img/h steady-state)", file=sys.stderr)
        if on_tpu:
            bench._log_experiment(
                "eval_bucket", w=w_px, h=h_px, joint_seq=joint,
                t_compile_s=round(t_compile, 1), t_scan_s=round(best, 3),
                steps=args.steps,
            )

    total_compile = sum(r[3] for r in rows)
    mean_scan = sum(r[4] for r in rows) / len(rows)
    print(f"\n{len(rows)} buckets: {total_compile:.0f}s total compile "
          f"(one-time, persisted in .jax_cache), then "
          f"{3600 / mean_scan:.0f} img/h mean steady-state", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
