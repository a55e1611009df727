"""FluxKontext sampling pipeline — the TPU answer to
ref:univa/utils/flux_pipeline.py:732-1138.

The torch reference runs a Python for-loop with an `xm.mark_step()` per
denoise step; here the whole 28-step loop is ONE jitted `lax.scan`, so XLA
schedules all steps back-to-back on device with zero host round-trips.
Shapes are static per (resolution-bucket, steps, cfg-mode) triple; the
17-entry PREFERRED_KONTEXT_RESOLUTIONS table bounds recompilation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux
from gpt_image_edit_tpu.models.vae import (
    VaeConfig,
    decode_from_scaled_latents,
    encode_to_scaled_latents,
)
from gpt_image_edit_tpu.ops.packing import latent_image_ids, pack_latents, unpack_latents
from gpt_image_edit_tpu.pipeline.scheduler import flow_sigmas

# ref:univa/utils/flux_pipeline.py:85-103 — the aspect buckets Kontext was
# trained on; also our static-shape compilation buckets.
PREFERRED_KONTEXT_RESOLUTIONS = [
    (672, 1568), (688, 1504), (720, 1456), (752, 1392), (800, 1328),
    (832, 1248), (880, 1184), (944, 1104), (1024, 1024), (1104, 944),
    (1184, 880), (1248, 832), (1328, 800), (1392, 752), (1456, 720),
    (1504, 688), (1568, 672),
]


def pick_kontext_resolution(width: int, height: int) -> Tuple[int, int]:
    """Closest trained bucket by aspect ratio -> (width, height)
    (ref:univa/utils/flux_pipeline.py:961-968)."""
    aspect = width / height
    _, w, h = min((abs(aspect - w / h), w, h) for w, h in PREFERRED_KONTEXT_RESOLUTIONS)
    return w, h


@functools.partial(
    jax.jit,
    static_argnames=("flux_cfg", "true_cfg_scale", "num_steps", "step_callback"),
)
def denoise_scan(
    flux_params,
    flux_cfg: FluxConfig,
    *,
    latents: jnp.ndarray,            # (B, S_target, 64) packed noise
    image_latents: Optional[jnp.ndarray],  # (B, S_ref, 64) packed ref latents
    latent_ids: jnp.ndarray,         # (S_target + S_ref, 3)
    prompt_embeds: jnp.ndarray,      # (B, S_txt, 4096)
    pooled_embeds: jnp.ndarray,      # (B, 768)
    sigmas: jnp.ndarray,             # (num_steps + 1,)
    guidance: jnp.ndarray,           # (B,)
    num_steps: int,
    neg_prompt_embeds: Optional[jnp.ndarray] = None,
    neg_pooled_embeds: Optional[jnp.ndarray] = None,
    true_cfg_scale: float = 1.0,
    txt_pad_mask: Optional[jnp.ndarray] = None,  # (B, S_txt)
    neg_txt_pad_mask: Optional[jnp.ndarray] = None,  # (B, S_txt_neg)
    step_callback=None,  # host fn(step_idx) via jax.debug.callback (UI progress)
) -> jnp.ndarray:
    """28-step (or N-step) Euler flow-matching loop as one lax.scan.

    Mirrors ref:univa/utils/flux_pipeline.py:1053-1120: each step feeds
    [latents ++ image_latents] to the MMDiT, truncates the prediction back to
    the target tokens, optional true-CFG combine, Euler update.
    """
    s_target = latents.shape[1]
    do_cfg = true_cfg_scale > 1.0 and neg_prompt_embeds is not None

    def _full_mask(tmask):
        if tmask is None:
            return None
        b = latents.shape[0]
        s_img_total = latent_ids.shape[0]
        return jnp.concatenate(
            [tmask.astype(jnp.bool_), jnp.ones((b, s_img_total), jnp.bool_)],
            axis=-1,
        )

    pad_mask = _full_mask(txt_pad_mask)
    neg_pad_mask = _full_mask(neg_txt_pad_mask) if do_cfg else None

    # rope tables are step-invariant: compute once OUTSIDE the scan
    from gpt_image_edit_tpu.ops.rope import flux_rope_freqs

    def _rope_for(s_txt):
        all_ids = jnp.concatenate(
            [jnp.zeros((s_txt, 3), jnp.float32), latent_ids], axis=0
        )
        return flux_rope_freqs(all_ids, flux_cfg.axes_dims_rope, flux_cfg.rope_theta)

    rope = _rope_for(prompt_embeds.shape[1])
    # the negative prompt may have a different (static) length: its own rope
    # table and pad mask (ref true-CFG encodes the branches independently)
    neg_rope = (
        rope
        if not do_cfg or neg_prompt_embeds.shape[1] == prompt_embeds.shape[1]
        else _rope_for(neg_prompt_embeds.shape[1])
    )

    def model(lat_in, sigma, embeds, pooled, mask, rope_tab):
        b = lat_in.shape[0]
        pred = apply_flux(
            flux_params,
            flux_cfg,
            hidden_states=lat_in,
            encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.broadcast_to(sigma, (b,)),
            img_ids=latent_ids,
            guidance=guidance if flux_cfg.guidance_embeds else None,
            pad_mask=mask,
            rope=rope_tab,
        )
        return pred[:, :s_target]

    def step(lat, xs):
        sig_pair, step_idx = xs
        sigma, sigma_next = sig_pair[0], sig_pair[1]
        if step_callback is not None:
            # per-step host progress (ref:app.py:308-313 callback_on_step_end)
            jax.debug.callback(step_callback, step_idx, ordered=True)
        lat_in = lat
        if image_latents is not None:
            lat_in = jnp.concatenate([lat, image_latents.astype(lat.dtype)], axis=1)
        pred = model(lat_in, sigma, prompt_embeds, pooled_embeds, pad_mask, rope)
        if do_cfg:
            neg = model(
                lat_in, sigma, neg_prompt_embeds, neg_pooled_embeds,
                neg_pad_mask, neg_rope,
            )
            pred = neg + true_cfg_scale * (pred - neg)
        # Euler update in fp32, carry stays in the latent dtype
        lat = (
            lat.astype(jnp.float32)
            + (sigma_next - sigma) * pred.astype(jnp.float32)
        ).astype(lat.dtype)
        return lat, None

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    latents, _ = jax.lax.scan(
        step, latents, (sig_pairs, jnp.arange(num_steps, dtype=jnp.int32))
    )
    return latents


class KontextPipeline:
    """End-to-end edit sampler: ref-image VAE encode -> denoise scan -> VAE decode.

    Prompt embeddings come from the LVLM (output_type='denoise_embeds'),
    optionally with T5 embeds appended — both are inputs here, matching
    how the reference pipeline accepts precomputed prompt_embeds
    (ref:univa/utils/flux_pipeline.py:929-942).
    """

    def __init__(
        self,
        flux_params,
        flux_cfg: FluxConfig,
        vae_params,
        vae_cfg: VaeConfig,
        mesh=None,
        offload: bool = False,
        vae_slicing: bool = False,
    ):
        """`mesh`: optional jax.sharding.Mesh — shards the denoiser/VAE params
        over (fsdp, tensor) for multi-chip serving; XLA inserts the ICI
        collectives (tensor-parallel inference).

        `offload`: the reference's `--offload` sequential CPU offload
        (ref:app.py:37,177-178 enable_model_cpu_offload), done the TPU way:
        component params are parked in `pinned_host` memory and staged into
        HBM only for the pipeline stage that uses them (VAE encode -> FLUX
        scan -> VAE decode), so the idle components hold zero device memory.
        Trades host<->HBM transfer time per edit for peak-HBM, exactly like
        the reference trades PCIe traffic.

        `vae_slicing`: the reference's enable_vae_slicing (ref:app.py:179):
        batched sampling decodes ONE latent at a time so VAE activation
        memory stays flat in num_images_per_prompt."""
        if offload and mesh is not None:
            raise ValueError("offload and mesh sharding are mutually exclusive")
        if mesh is not None:
            from gpt_image_edit_tpu.parallel import shard_params

            flux_params = shard_params(flux_params, mesh)
            vae_params = shard_params(vae_params, mesh)
        self.mesh = mesh
        self.flux_cfg = flux_cfg
        self.vae_cfg = vae_cfg
        # VAE compute dtype follows the params (the reference serves the
        # whole pipeline incl. VAE in bf16, ref:univa/serve/cli.py:39,67);
        # coerce inputs so an fp32 host image doesn't silently promote the
        # convs back to fp32.
        vae_dtype = jnp.result_type(
            *(jax.tree_util.tree_leaves(vae_params)[:1] or [jnp.float32])
        )
        from gpt_image_edit_tpu.utils.offload import ComponentStore

        self.offload = offload
        self.vae_slicing = vae_slicing
        self._store = ComponentStore(enabled=offload)
        self.flux_params = self._store.add("flux", flux_params)
        self.vae_params = self._store.add("vae", vae_params)
        self._encode = jax.jit(
            lambda p, x: encode_to_scaled_latents(
                p, vae_cfg, x.astype(vae_dtype)
            )
        )
        self._decode = jax.jit(
            lambda p, z: decode_from_scaled_latents(
                p, vae_cfg, z.astype(vae_dtype)
            )
        )

    def _component(self, name: str):
        """Device-resident params for `name` ('flux' | 'vae'): in offload
        mode, stage the pinned_host master into HBM on first use."""
        return self._store.stage(name)

    def _evict(self, name: str):
        """Drop the HBM copy of `name` (host master stays). In-flight
        computations keep their buffers alive; this only releases our ref."""
        self._store.evict(name)

    def encode_reference(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image: (B, H, W, 3) in [-1, 1] -> (packed ref latents, ref ids)."""
        lat = self._encode(self._component("vae"), image)
        b, h, w, c = lat.shape
        packed = pack_latents(lat)
        ids = latent_image_ids(h // 2, w // 2, modality=1)
        return packed, ids

    def encode_references(self, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Multiple conditioning images (OmniContext-style multi-ref,
        ref:univa/eval/omnicontext/inference.py:146-290): each VAE-encoded,
        packed, and concatenated along the sequence dim; the k-th reference
        gets rope modality id k+1."""
        packed_list, ids_list = [], []
        for k, img in enumerate(images):
            lat = self._encode(self._component("vae"), img)
            _, h, w, _ = lat.shape
            packed_list.append(pack_latents(lat))
            ids_list.append(latent_image_ids(h // 2, w // 2, modality=k + 1))
        return (
            jnp.concatenate(packed_list, axis=1),
            jnp.concatenate(ids_list, axis=0),
        )

    def __call__(
        self,
        *,
        prompt_embeds: jnp.ndarray,
        pooled_prompt_embeds: jnp.ndarray,
        image: Optional[jnp.ndarray] = None,          # (B, H, W, 3) in [-1, 1]
        image_latents: Optional[jnp.ndarray] = None,  # pre-packed alternative
        image_ids: Optional[jnp.ndarray] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        true_cfg_scale: float = 1.0,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pixels",
        txt_pad_mask: Optional[jnp.ndarray] = None,
        neg_txt_pad_mask: Optional[jnp.ndarray] = None,
        step_callback=None,
        num_images_per_prompt: int = 1,
    ) -> jnp.ndarray:
        if num_images_per_prompt > 1:
            # true batched sampling: tile the conditioning, one scan at B=N
            # (ref flux_pipeline num_images_per_prompt, ref:app.py:318-325)
            n = num_images_per_prompt
            tile = lambda x: None if x is None else jnp.repeat(x, n, axis=0)
            prompt_embeds = tile(prompt_embeds)
            pooled_prompt_embeds = tile(pooled_prompt_embeds)
            negative_prompt_embeds = tile(negative_prompt_embeds)
            negative_pooled_prompt_embeds = tile(negative_pooled_prompt_embeds)
            txt_pad_mask = tile(txt_pad_mask)
            neg_txt_pad_mask = tile(neg_txt_pad_mask)
            latents = tile(latents)
            if image is not None:
                if isinstance(image, (list, tuple)):
                    image = [tile(im) for im in image]
                else:
                    image = tile(image)
            image_latents = tile(image_latents)
        b = prompt_embeds.shape[0]
        down = self.vae_cfg.downscale
        lat_h = 2 * (height // (down * 2))
        lat_w = 2 * (width // (down * 2))

        if latents is None:
            assert rng is not None, "need an rng for the initial noise"
            noise = jax.random.normal(
                rng, (b, lat_h, lat_w, self.vae_cfg.latent_channels), dtype=jnp.float32
            ).astype(prompt_embeds.dtype)
            latents = pack_latents(noise)

        latent_ids = latent_image_ids(lat_h // 2, lat_w // 2, modality=0)
        if image is not None:
            if isinstance(image, (list, tuple)):
                image_latents, image_ids = self.encode_references(image)
            else:
                image_latents, image_ids = self.encode_reference(image)
            image_latents = image_latents.astype(latents.dtype)
        if image_latents is not None:
            assert image_ids is not None
            latent_ids = jnp.concatenate([latent_ids, image_ids], axis=0)

        sigmas = jnp.asarray(flow_sigmas(num_inference_steps, latents.shape[1]))
        guidance = jnp.full((b,), guidance_scale, dtype=jnp.float32)

        if self.offload:
            # Barrier before committing the FLUX HBM copy: on axon dispatch
            # is async, so without a sync the VLM-prefill / VAE-encode
            # consumers may still hold their weights' buffers while the
            # ~12GB FLUX stage-in lands -> transient co-residency OOM.
            from gpt_image_edit_tpu.utils.offload import sync as _offload_sync

            _offload_sync(prompt_embeds)
            if image_latents is not None:
                _offload_sync(image_latents)
            self._evict("vae")  # scan is the HBM-peak stage
        final = denoise_scan(
            self._component("flux"),
            self.flux_cfg,
            latents=latents,
            image_latents=image_latents,
            latent_ids=latent_ids,
            prompt_embeds=prompt_embeds,
            pooled_embeds=pooled_prompt_embeds,
            sigmas=sigmas,
            guidance=guidance,
            num_steps=num_inference_steps,
            neg_prompt_embeds=negative_prompt_embeds,
            neg_pooled_embeds=negative_pooled_prompt_embeds,
            true_cfg_scale=true_cfg_scale,
            txt_pad_mask=txt_pad_mask,
            neg_txt_pad_mask=neg_txt_pad_mask,
            step_callback=step_callback,
        )
        if self.offload:
            # barrier on the scan before staging the VAE: same co-residency
            # hazard as the FLUX stage-in above (eviction only drops a ref;
            # the in-flight scan still holds the FLUX HBM copy)
            from gpt_image_edit_tpu.utils.offload import sync as _offload_sync

            _offload_sync(final)
            self._evict("flux")
        if output_type == "latent":
            return final
        z = unpack_latents(final, lat_h, lat_w).astype(jnp.float32)
        vp = self._component("vae")
        if self.vae_slicing and z.shape[0] > 1:
            out = jnp.concatenate(
                [self._decode(vp, z[i : i + 1]) for i in range(z.shape[0])],
                axis=0,
            )
        else:
            out = self._decode(vp, z)
        if self.offload:
            self._evict("vae")  # idle pipeline holds zero HBM
        return out


def postprocess_to_uint8(images: jnp.ndarray) -> np.ndarray:
    """(B, H, W, 3) in [-1, 1] -> uint8 numpy."""
    arr = np.asarray(jax.device_get(images), dtype=np.float32)
    arr = np.clip(arr / 2.0 + 0.5, 0.0, 1.0)
    return (arr * 255.0).round().astype(np.uint8)
