"""The jitted training step: VLM encode -> FLUX velocity pred -> weighted MSE.

Parity target: the hot loop of ref:train_denoiser.py:827-1185 —
sigmoid-normal sigma sampling with Kontext resolution shift (:960-995),
packed-latent Kontext concat (:1006-1055), output_type='denoise_model_pred'
(:1073), sd3 weighting x region mask MSE (:1106-1167).

TPU-first differences:
- the whole step (VAE encodes, VLM forward, FLUX forward+backward, optimizer)
  is ONE compiled function; gradient 'allreduce' is whatever psum/
  reduce-scatter GSPMD inserts for the mesh shardings.
- frozen params (VLM trunk, VAE, text-branch...) are a *separate closure
  argument*, so autodiff never materializes their gradients (the ZeRO
  requires_grad dance becomes a pytree partition).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux
from gpt_image_edit_tpu.models.qwen2p5vl import Qwen2p5VLConfig, apply_qwen
from gpt_image_edit_tpu.models.vae import VaeConfig, encode_to_scaled_latents
from gpt_image_edit_tpu.ops.packing import latent_image_ids, pack_latents
from gpt_image_edit_tpu.pipeline.scheduler import calculate_shift


# --------------------------------------------------------------------------
# param partition (trainable vs frozen)
# --------------------------------------------------------------------------

def partition_params(params, mask):
    """Split params by a boolean pytree. None prunes the leaf from the tree
    (None is an empty pytree node), so grads are only ever computed for the
    trainable side."""
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine_params(train, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t,
        train,
        frozen,
        is_leaf=lambda x: x is None,
    )


# --------------------------------------------------------------------------
# loss pieces
# --------------------------------------------------------------------------

def sample_sigmas(rng, bsz: int, latent_hw: int, *, logit_std: float = 1.0):
    """sigmoid-normal sigmas with FLUX resolution shift
    (ref:train_denoiser.py:960-993). latent_hw = latent H * W (static)."""
    u = jax.random.normal(rng, (bsz,), dtype=jnp.float32) * logit_std
    sigmas = jax.nn.sigmoid(u)
    mu = calculate_shift(latent_hw // 4, max_shift=1.16)  # ref uses 1.16 in training
    shift = math.exp(mu)
    return (sigmas * shift) / (1.0 + (shift - 1.0) * sigmas)


def sample_sigmas_discrete(
    rng,
    bsz: int,
    *,
    weighting_scheme: str = "logit_normal",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
    num_train_timesteps: int = 1000,
):
    """discrete_timestep=true path: density-based timestep sampling over the
    scheduler's table (diffusers compute_density_for_timestep_sampling;
    ref:train_denoiser.py:939-958). Sigma table = linspace(1, 1/N, N)."""
    if weighting_scheme == "logit_normal":
        u = jax.nn.sigmoid(
            jax.random.normal(rng, (bsz,)) * logit_std + logit_mean
        )
    elif weighting_scheme == "mode":
        u = jax.random.uniform(rng, (bsz,))
        u = 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    else:
        u = jax.random.uniform(rng, (bsz,))
    idx = (u * num_train_timesteps).astype(jnp.int32)
    idx = jnp.clip(idx, 0, num_train_timesteps - 1)
    sigmas_table = jnp.linspace(
        1.0, 1.0 / num_train_timesteps, num_train_timesteps, dtype=jnp.float32
    )
    return sigmas_table[idx]


def loss_weighting(scheme: str, sigmas: jnp.ndarray) -> jnp.ndarray:
    """compute_loss_weighting_for_sd3 equivalents (diffusers training utils)."""
    if scheme == "sigma_sqrt":
        return sigmas ** -2.0
    if scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


def flow_matching_loss(
    params: Dict[str, Any],
    *,
    qwen_cfg: Qwen2p5VLConfig,
    flux_cfg: FluxConfig,
    vae_cfg: VaeConfig,
    vae_params,
    batch: Dict[str, Any],
    rng: jax.Array,
    guidance_scale: float = 1.0,
    weighting_scheme: str = "none",
    sigmas_as_weight: bool = False,
    discrete_timestep: bool = False,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One forward pass -> scalar loss. `params` = {'qwen': ..., 'flux': ...}.

    batch keys:
      input_ids (B,S), position_ids (3,B,S), attention_mask (B,S)
      pixel_patches (N,patch_dim) + vision_aux   [optional, ViT view of refs]
      target_pixels (B,H,W,3) in [-1,1]
      ref_pixels (B,Hr,Wr,3) or (B,K,Hr,Wr,3)    [optional Kontext conditioning;
                                                  5-D = multi-ref, zero-padded]
      ref_valid (B,K) bool                       [with 5-D ref_pixels]
      weight_mask (B, S_tgt)                     [optional region weights]
      t5_embeds (B,S_t5,4096)                    [optional T5 suffix]
    """
    r_sigma, r_noise = jax.random.split(rng)

    # --- conditioning: LVLM -> MLP2 (ref :1073 output_type='denoise_model_pred')
    prompt_embeds = apply_qwen(
        params["qwen"],
        qwen_cfg,
        input_ids=batch["input_ids"],
        position_ids=batch["position_ids"],
        attention_mask=batch.get("attention_mask"),
        pixel_patches=batch.get("pixel_patches"),
        vision_aux=batch.get("vision_aux"),
        output_type="denoise_embeds",
    ).astype(compute_dtype)
    if batch.get("t5_embeds") is not None:
        # T5 appended AFTER VLM embeds for flux (ref:modeling_univa_denoise_tower.py:64-71)
        prompt_embeds = jnp.concatenate(
            [prompt_embeds, batch["t5_embeds"].astype(compute_dtype)], axis=1
        )

    # --- latents (VAE runs fp32 per ref vae_fp32, stop-grad)
    x0 = encode_to_scaled_latents(
        vae_params, vae_cfg, batch["target_pixels"].astype(jnp.float32)
    )
    x0 = jax.lax.stop_gradient(x0)
    b, lh, lw, c = x0.shape
    x0p = pack_latents(x0).astype(jnp.float32)  # (B, S_tgt, 4C)

    ref_packed = None
    ref_token_mask = None  # (B, S_ref_total) False on padded-ref tokens
    ids = latent_image_ids(lh // 2, lw // 2, modality=0)
    if batch.get("ref_pixels") is not None:
        rp = batch["ref_pixels"]
        if rp.ndim == 5:
            # multi-reference conditioning: K refs per sample, zero-padded
            # with a validity mask. All ref latents are concatenated along
            # the sequence dim with modality ids 1..K — the training-side
            # mirror of inference's encode_references
            # (ref:train_denoiser.py:1006-1055, data_collator.py:6-47).
            bb, k, rh_px, rw_px, cc = rp.shape
            xr = encode_to_scaled_latents(
                vae_params, vae_cfg,
                rp.reshape(bb * k, rh_px, rw_px, cc).astype(jnp.float32),
            )
            xr = jax.lax.stop_gradient(xr)
            rh, rw = xr.shape[1], xr.shape[2]
            packed = pack_latents(xr).astype(compute_dtype)  # (B*K, S_r, 4C)
            s_r = packed.shape[1]
            ref_packed = packed.reshape(bb, k * s_r, packed.shape[-1])
            ids = jnp.concatenate(
                [ids]
                + [latent_image_ids(rh // 2, rw // 2, modality=i + 1) for i in range(k)],
                axis=0,
            )
            if batch.get("ref_valid") is not None:
                ref_token_mask = jnp.repeat(
                    batch["ref_valid"].astype(jnp.bool_), s_r, axis=1
                )
        else:
            xr = encode_to_scaled_latents(
                vae_params, vae_cfg, rp.astype(jnp.float32)
            )
            xr = jax.lax.stop_gradient(xr)
            ref_packed = pack_latents(xr).astype(compute_dtype)
            rh, rw = xr.shape[1], xr.shape[2]
            ids = jnp.concatenate(
                [ids, latent_image_ids(rh // 2, rw // 2, modality=1)], axis=0
            )

    # --- flow matching: x_s = (1-s) x0 + s eps, target v = eps - x0
    if discrete_timestep:
        sigmas = sample_sigmas_discrete(
            r_sigma, b, weighting_scheme=weighting_scheme or "logit_normal",
            logit_mean=logit_mean, logit_std=logit_std,
        )
    else:
        sigmas = sample_sigmas(r_sigma, b, lh * lw, logit_std=logit_std)
    noise = jax.random.normal(r_noise, x0p.shape, dtype=jnp.float32)
    s_ = sigmas[:, None, None]
    noisy = (1.0 - s_) * x0p + s_ * noise

    model_in = noisy.astype(compute_dtype)
    if ref_packed is not None:
        model_in = jnp.concatenate([model_in, ref_packed], axis=1)

    pad_mask = None
    if batch.get("attention_mask") is not None or ref_token_mask is not None:
        t5_len = 0 if batch.get("t5_embeds") is None else batch["t5_embeds"].shape[1]
        text_mask = (
            batch["attention_mask"].astype(jnp.bool_)
            if batch.get("attention_mask") is not None
            else jnp.ones((b, prompt_embeds.shape[1] - t5_len), jnp.bool_)
        )
        tgt_len = x0p.shape[1]
        ref_len = model_in.shape[1] - tgt_len
        ref_mask = (
            ref_token_mask
            if ref_token_mask is not None
            else jnp.ones((b, ref_len), jnp.bool_)
        )
        pad_mask = jnp.concatenate(
            [text_mask, jnp.ones((b, t5_len + tgt_len), jnp.bool_), ref_mask],
            axis=-1,
        )

    pred = apply_flux(
        params["flux"],
        flux_cfg,
        hidden_states=model_in,
        encoder_hidden_states=prompt_embeds,
        pooled_projections=batch.get(
            "pooled_embeds", jnp.zeros((b, flux_cfg.pooled_projection_dim), compute_dtype)
        ),
        timestep=sigmas,
        img_ids=ids,
        guidance=jnp.full((b,), guidance_scale, jnp.float32)
        if flux_cfg.guidance_embeds
        else None,
        pad_mask=pad_mask,
    )
    pred = pred[:, : x0p.shape[1]].astype(jnp.float32)

    target = noise - x0p
    w = sigmas if sigmas_as_weight else loss_weighting(weighting_scheme, sigmas)
    w = w[:, None]  # (B, 1) over tokens
    if batch.get("weight_mask") is not None:
        w = w * batch["weight_mask"].astype(jnp.float32)  # (B, S_tgt)
    sq = jnp.mean((pred - target) ** 2, axis=-1)  # (B, S_tgt)
    if batch.get("weight_mask") is not None:
        return jnp.sum(w * sq) / jnp.maximum(jnp.sum(batch["weight_mask"]), 1.0)
    return jnp.mean(w * sq)


# --------------------------------------------------------------------------
# the step
# --------------------------------------------------------------------------

def make_train_step(
    *,
    qwen_cfg: Qwen2p5VLConfig,
    flux_cfg: FluxConfig,
    vae_cfg: VaeConfig,
    tx,
    guidance_scale: float = 1.0,
    weighting_scheme: str = "none",
    sigmas_as_weight: bool = False,
    discrete_timestep: bool = False,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
):
    """Returns train_step(state, frozen, vae_params, batch, rng) -> (state, metrics).

    state = {"train": trainable-subtree, "opt": opt_state, "step": i32[]}
    frozen = the non-trainable param subtree (merged inside the loss).
    """

    def loss_fn(train_params, frozen, vae_params, batch, rng):
        params = combine_params(train_params, frozen)
        return flow_matching_loss(
            params,
            qwen_cfg=qwen_cfg,
            flux_cfg=flux_cfg,
            vae_cfg=vae_cfg,
            vae_params=vae_params,
            batch=batch,
            rng=rng,
            guidance_scale=guidance_scale,
            weighting_scheme=weighting_scheme,
            sigmas_as_weight=sigmas_as_weight,
            discrete_timestep=discrete_timestep,
            logit_mean=logit_mean,
            logit_std=logit_std,
            compute_dtype=compute_dtype,
        )

    def train_step(state, frozen, vae_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["train"], frozen, vae_params, batch, rng
        )
        updates, opt = tx.update(grads, state["opt"], state["train"])
        train = optax_apply_updates(state["train"], updates)
        gnorm = optax_global_norm(grads)
        new_state = {"train": train, "opt": opt, "step": state["step"] + 1}
        return new_state, {"loss": loss, "grad_norm": gnorm}

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def optax_apply_updates(params, updates):
    import optax

    return optax.apply_updates(params, updates)


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)


def init_train_state(params, mask, tx):
    train, frozen = partition_params(params, mask)
    opt = tx.init(train)
    return {"train": train, "opt": opt, "step": jnp.zeros((), jnp.int32)}, frozen
