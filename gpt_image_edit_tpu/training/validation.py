"""In-training validation image generation (ref:train_denoiser.py:1243-1352,
log_validation :1384-1618).

Every `validation_steps` the trainer samples probe edits with the CURRENT
(trainable+frozen merged) params through the real Kontext pipeline and writes
PNGs under output_dir/validation/step_{N}/ (wandb logging when available)."""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.pipeline.kontext import KontextPipeline, postprocess_to_uint8
from gpt_image_edit_tpu.training.train_step import combine_params

log = logging.getLogger("gie_tpu.validate")


@dataclasses.dataclass
class ValidationProbe:
    name: str
    prompt: str
    image_path: Optional[str] = None          # single conditioning image
    image_paths: Optional[List[str]] = None   # multi-ref (iit2i/REFiit2i slots)

    def paths(self) -> List[str]:
        if self.image_paths:
            return list(self.image_paths)
        return [self.image_path] if self.image_path else []


def run_validation(
    *,
    state,
    frozen,
    vae_params,
    qwen_cfg,
    flux_cfg,
    vae_cfg,
    encode_prompt_fn,      # (params, prompt, images: List) -> (prompt_embeds, pooled)
    probes: List[ValidationProbe],
    output_dir: str,
    step: int,
    height: int = 512,
    width: int = 512,
    num_steps: int = 28,
    guidance: float = 3.5,
    seed: int = 0,
) -> List[str]:
    """Generate one image per probe; returns written paths."""
    from PIL import Image

    from gpt_image_edit_tpu.data.image_processing import preprocess_vae_image

    params = combine_params(state["train"], frozen)
    pipe = KontextPipeline(params["flux"], flux_cfg, vae_params, vae_cfg)
    outdir = os.path.join(output_dir, "validation", f"step_{step}")
    os.makedirs(outdir, exist_ok=True)

    written = []
    for i, probe in enumerate(probes):
        images = [Image.open(p) for p in probe.paths()]
        embeds, pooled = encode_prompt_fn(params, probe.prompt, images)
        cond = None
        if len(images) > 1:
            cond = [
                jnp.asarray(preprocess_vae_image(im, height, width))[None]
                for im in images
            ]
        elif images:
            cond = jnp.asarray(preprocess_vae_image(images[0], height, width))[None]
        out = pipe(
            prompt_embeds=embeds,
            pooled_prompt_embeds=pooled,
            image=cond,
            height=height,
            width=width,
            num_inference_steps=num_steps,
            guidance_scale=guidance,
            rng=jax.random.key(seed + i),
        )
        arr = postprocess_to_uint8(out)[0]
        path = os.path.join(outdir, f"{probe.name}.png")
        Image.fromarray(arr).save(path)
        written.append(path)
        log.info("validation image: %s", path)

    _maybe_wandb_log(written, step)
    return written


def _maybe_wandb_log(paths: List[str], step: int):
    try:  # wandb is optional in this environment
        import wandb

        if wandb.run is not None:
            wandb.log(
                {"validation": [wandb.Image(p) for p in paths]}, step=step
            )
    except ImportError:
        pass
