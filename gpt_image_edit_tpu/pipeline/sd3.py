"""SD3 sampling (ref:univa/utils/sd3_pipeline.py + sd3_pipeline_multicfg.py).

Same lax.scan flow-matching Euler loop as Kontext, with SD3's trims: static
schedule shift (3.0, no resolution-dependent mu), unpacked NHWC latents
(SD3 patchifies internally), and the multicfg option — *separate* guidance
scales per negative-prompt branch (the reference's multicfg pipeline)."""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.sd3_model import SD3Config, apply as apply_sd3
from gpt_image_edit_tpu.pipeline.scheduler import shift_sigmas


def sd3_sigmas(num_steps: int, shift: float = 3.0) -> np.ndarray:
    sig = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps", "n_neg"))
def sd3_denoise_scan(
    params,
    cfg: SD3Config,
    *,
    latents: jnp.ndarray,            # (B, H, W, C) noise
    prompt_embeds: jnp.ndarray,      # (B, S, joint_attention_dim)
    pooled_embeds: jnp.ndarray,      # (B, pooled_projection_dim)
    sigmas: jnp.ndarray,
    num_steps: int,
    neg_prompt_embeds: Tuple[jnp.ndarray, ...] = (),
    neg_pooled_embeds: Tuple[jnp.ndarray, ...] = (),
    cfg_scales: Tuple[float, ...] = (),
    n_neg: int = 0,
) -> jnp.ndarray:
    """Euler loop. multicfg: pred = neg_0 + sum_i s_i * (branch_{i+1} -
    branch_i) chain collapsed as pred = pos + sum_i s_i (pos - neg_i) ...
    here we use the standard additive form: pred = pos + Σ_i s_i (pos - neg_i)
    normalized by branch (the multicfg pipeline's independent scales)."""

    def model(lat, sigma, embeds, pooled):
        b = lat.shape[0]
        return apply_sd3(
            params, cfg,
            hidden_states=lat,
            encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.broadcast_to(sigma, (b,)),
        )

    def step(lat, sig_pair):
        sigma, sigma_next = sig_pair[0], sig_pair[1]
        pred = model(lat, sigma, prompt_embeds, pooled_embeds)
        for i in range(n_neg):
            neg = model(lat, sigma, neg_prompt_embeds[i], neg_pooled_embeds[i])
            pred = pred + cfg_scales[i] * (pred - neg)
        lat = (
            lat.astype(jnp.float32)
            + (sigma_next - sigma) * pred.astype(jnp.float32)
        ).astype(lat.dtype)
        return lat, None

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    latents, _ = jax.lax.scan(step, latents, sig_pairs)
    return latents


class SD3Pipeline:
    """Minimal SD3 text-to-image pipeline over our VAE + SD3 MMDiT."""

    def __init__(self, sd3_params, sd3_cfg: SD3Config, vae_params, vae_cfg,
                 offload: bool = False):
        """`offload`: same pinned_host sequential offload as KontextPipeline
        (the reference's enable_model_cpu_offload, ref:app.py:177-178)."""
        from gpt_image_edit_tpu.models.vae import decode_from_scaled_latents
        from gpt_image_edit_tpu.utils.offload import ComponentStore

        self.cfg = sd3_cfg
        self._store = ComponentStore(enabled=offload)
        self.offload = offload
        self.params = self._store.add("sd3", sd3_params)
        self.vae_params = self._store.add("vae", vae_params)
        self._decode = jax.jit(
            lambda p, z: decode_from_scaled_latents(p, vae_cfg, z)
        )
        self.vae_cfg = vae_cfg

    def __call__(
        self,
        *,
        prompt_embeds: jnp.ndarray,
        pooled_prompt_embeds: jnp.ndarray,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        negative_prompt_embeds: Optional[List[jnp.ndarray]] = None,
        negative_pooled_prompt_embeds: Optional[List[jnp.ndarray]] = None,
        guidance_scales: Optional[List[float]] = None,
        rng: Optional[jax.Array] = None,
        output_type: str = "pixels",
    ):
        b = prompt_embeds.shape[0]
        down = self.vae_cfg.downscale
        lat = jax.random.normal(
            rng, (b, height // down, width // down, self.vae_cfg.latent_channels),
            dtype=prompt_embeds.dtype,
        )
        negs = tuple(negative_prompt_embeds or ())
        neg_pooled = tuple(negative_pooled_prompt_embeds or ())
        scales = tuple(guidance_scales or ())
        out = sd3_denoise_scan(
            self._store.stage("sd3"), self.cfg,
            latents=lat,
            prompt_embeds=prompt_embeds,
            pooled_embeds=pooled_prompt_embeds,
            sigmas=jnp.asarray(sd3_sigmas(num_inference_steps)),
            num_steps=num_inference_steps,
            neg_prompt_embeds=negs,
            neg_pooled_embeds=neg_pooled,
            cfg_scales=scales,
            n_neg=len(negs),
        )
        if self.offload:
            from gpt_image_edit_tpu.utils.offload import sync as _sync

            _sync(out)             # scan consumers done -> sd3 freeable
            self._store.evict("sd3")
        if output_type == "latent":
            return out
        img = self._decode(self._store.stage("vae"), out.astype(jnp.float32))
        if self.offload:
            self._store.evict("vae")
        return img
