"""The training driver: config -> models -> mesh -> loop.

Covers the responsibilities of ref:train_denoiser.py:315-1380 (model load,
selective freeze, optimizer, dataloader, hot loop, EMA, checkpoints,
logging, profiler) reorganized TPU-first: one jitted step, shardings instead
of ZeRO wrappers, orbax instead of accelerator.save_state."""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.data.collator import Collator
from gpt_image_edit_tpu.data.dataset import EditDataset
from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
from gpt_image_edit_tpu.models.qwen2p5vl import Qwen2p5VLConfig, init_qwen
from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
from gpt_image_edit_tpu.parallel import batch_sharding, build_mesh, shard_params
from gpt_image_edit_tpu.training import checkpoints as ckpt
from gpt_image_edit_tpu.training.config import TrainDenoiseConfig
from gpt_image_edit_tpu.training.ema import ema_decay_for_step, ema_update, init_ema
from gpt_image_edit_tpu.training.optimizer import build_optimizer
from gpt_image_edit_tpu.training.train_step import init_train_state, make_train_step

log = logging.getLogger("gie_tpu.train")


def build_models(cfg: TrainDenoiseConfig):
    """Returns (qcfg, fcfg, vcfg, params, vae_params)."""
    mc = cfg.model_config
    if mc.tiny:
        qcfg = Qwen2p5VLConfig.tiny()
        fcfg = dataclasses.replace(
            FluxConfig.tiny(), joint_attention_dim=qcfg.projector_out
        )
        vcfg = VaeConfig.tiny()
        params = {
            "qwen": init_qwen(jax.random.key(0), qcfg),
            "flux": init_flux(jax.random.key(1), fcfg),
        }
        vae_params = init_vae(jax.random.key(2), vcfg)
        return qcfg, fcfg, vcfg, params, vae_params

    from gpt_image_edit_tpu.utils.ckpt_convert import (
        TensorSource,
        convert_vae,
        load_merged_checkpoint,
    )

    qcfg = Qwen2p5VLConfig()
    fcfg = FluxConfig()
    vcfg = VaeConfig()
    qwen, flux = load_merged_checkpoint(mc.pretrained_lvlm_name_or_path, qcfg, fcfg)
    vae_src = TensorSource.from_dir(mc.pretrained_denoiser_name_or_path)
    vae_params = convert_vae(vae_src, vcfg)
    return qcfg, fcfg, vcfg, {"qwen": qwen, "flux": flux}, vae_params


def data_iterator(cfg: TrainDenoiseConfig, qcfg, vcfg=None) -> Iterator[Dict[str, Any]]:
    dc = cfg.dataset_config
    tok = load_tokenizer(
        "fake" if (dc.random_data or cfg.model_config.tiny)
        else cfg.model_config.pretrained_lvlm_name_or_path
    )
    ds = EditDataset(
        tokenizer=tok,
        data_txt=dc.data_txt,
        height=dc.height,
        width=dc.width,
        min_pixels=dc.min_pixels,
        max_pixels=dc.max_pixels,
        drop_prompt_rate=cfg.training_config.drop_prompt_rate,
        mask_weight_type=cfg.training_config.mask_weight_type,
        max_seq_len=dc.max_seq_len,
        random_data=dc.random_data,
        seed=cfg.training_config.seed,
        patch_size=qcfg.vision.patch_size,
        merge_size=qcfg.vision.spatial_merge_size,
        temporal_patch_size=qcfg.vision.temporal_patch_size,
        latent_downscale=vcfg.downscale if vcfg is not None else 8,
    )
    coll = Collator(qcfg.vision, padding_side=dc.padding_side)
    from gpt_image_edit_tpu.data.loader import BatchLoader

    loader = BatchLoader(
        ds, coll,
        batch_size=dc.batch_size,
        num_workers=dc.num_workers,
        seed=cfg.training_config.seed,
    )
    yield from loader


def _run_validation_probes(cfg, state, frozen, vae_params, qcfg, fcfg, vcfg, step):
    """Periodic probe-image generation (ref:train_denoiser.py:1243-1352).
    Probes come from `dataset_config.validation_*_prompt/path` pairs when
    configured; in random_data/tiny mode a synthetic probe is used."""
    from PIL import Image

    from gpt_image_edit_tpu.data import constants as C
    from gpt_image_edit_tpu.data.image_processing import preprocess_vit_patches
    from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
    from gpt_image_edit_tpu.models.qwen2p5vl import apply_qwen, vision
    from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index
    from gpt_image_edit_tpu.training.validation import ValidationProbe, run_validation

    dc = cfg.dataset_config
    tok = load_tokenizer(
        "fake" if (dc.random_data or cfg.model_config.tiny)
        else cfg.model_config.pretrained_lvlm_name_or_path
    )

    probes = [ValidationProbe(name="synthetic", prompt="make the sky dramatic")]

    def encode_prompt_fn(params, prompt, image):
        value = ("<image>" if image is not None else "") + prompt
        text = (
            f"<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            f"<|im_start|>user\n{value}<|im_end|>\n<|im_start|>assistant\n"
            + C.SPECIAL_TOKENS["image_begin_token"]
        )
        patches = grids = None
        if image is not None:
            flat, grid = preprocess_vit_patches(
                image,
                patch_size=qcfg.vision.patch_size,
                merge_size=qcfg.vision.spatial_merge_size,
                min_pixels=dc.min_pixels, max_pixels=dc.max_pixels,
            )
            n = int(np.prod(grid)) // qcfg.vision.merge_unit
            text = text.replace(
                "<image>",
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * n
                + C.SPECIAL_TOKENS["image_end_token"],
                1,
            )
            patches, grids = flat, np.asarray([grid], np.int64)
        ids = np.asarray([tok.encode(text)], np.int64)
        attn = np.ones_like(ids)
        pos, _ = get_rope_index(
            ids, grids, attn,
            spatial_merge_size=qcfg.vision.spatial_merge_size,
            image_token_id=qcfg.image_token_id,
            video_token_id=qcfg.video_token_id,
            vision_start_token_id=qcfg.vision_start_token_id,
        )
        kwargs = {}
        if patches is not None:
            kwargs = dict(
                pixel_patches=jnp.asarray(patches),
                vision_aux=vision.vision_precompute(grids, qcfg.vision),
            )
        embeds = apply_qwen(
            params["qwen"], qcfg,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            attention_mask=jnp.asarray(attn), output_type="denoise_embeds",
            **kwargs,
        )
        pooled = jnp.zeros((1, fcfg.pooled_projection_dim), embeds.dtype)
        return embeds, pooled

    size = 8 * vcfg.downscale if vcfg.downscale != 8 else 512
    run_validation(
        state=state, frozen=frozen, vae_params=vae_params,
        qwen_cfg=qcfg, flux_cfg=fcfg, vae_cfg=vcfg,
        encode_prompt_fn=encode_prompt_fn, probes=probes,
        output_dir=cfg.training_config.output_dir, step=step,
        height=size, width=size,
        num_steps=4 if cfg.model_config.tiny else 28,
    )


def train(cfg: TrainDenoiseConfig, max_steps: Optional[int] = None) -> Dict[str, Any]:
    tc = cfg.training_config
    mc = cfg.model_config
    max_steps = max_steps or tc.max_train_steps

    qcfg, fcfg, vcfg, params, vae_params = build_models(cfg)
    compute_dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32

    mesh = build_mesh(shape=cfg.parallel_config.mesh_shape)
    log.info("mesh: %s", dict(mesh.shape))
    params = shard_params(params, mesh)
    vae_params = shard_params(vae_params, mesh)

    tx, mask = build_optimizer(params, tc, mc, fcfg.num_layers, fcfg.num_single_layers)
    state, frozen = init_train_state(params, mask, tx)
    ema = init_ema(state["train"]) if tc.ema_decay else None

    manager = ckpt.make_manager(tc.output_dir, tc.checkpoints_total_limit)
    start_step = 0
    if tc.resume_from_checkpoint:
        restored = ckpt.restore_latest(manager, {"state": state, "ema": ema}, mesh=mesh)
        if restored is not None:
            start_step, blob = restored
            state, ema = blob["state"], blob["ema"]
            log.info("resumed from step %d", start_step)

    step_fn = make_train_step(
        qwen_cfg=qcfg,
        flux_cfg=fcfg,
        vae_cfg=vcfg,
        tx=tx,
        guidance_scale=mc.guidance_scale,
        weighting_scheme=tc.weighting_scheme,
        sigmas_as_weight=tc.sigmas_as_weight,
        discrete_timestep=tc.discrete_timestep,
        logit_mean=tc.logit_mean,
        logit_std=tc.logit_std,
        compute_dtype=compute_dtype,
    )

    # CLIP pooled conditioning: the reference computes the EMPTY-prompt pooled
    # embedding once and feeds it every step (ref:train_denoiser.py:795-801,
    # drop_t5_rate=1.0 stages). Real checkpoints carry the CLIP encoder; tiny
    # mode falls back to zeros inside the loss.
    pooled_row = None
    if not mc.tiny and mc.pretrained_denoiser_name_or_path:
        try:
            from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

            enc = FluxTextEncoders(mc.pretrained_denoiser_name_or_path)
            pooled_row = enc.encode_clip_pooled([""])
            log.info("empty-prompt CLIP pooled embeds ready")
        except Exception as e:
            log.warning("CLIP pooled embeds unavailable (%s); using zeros", e)

    it = data_iterator(cfg, qcfg, vcfg)
    rng = jax.random.key(tc.seed)
    metrics_out: Dict[str, Any] = {}

    if tc.profile_out_dir:
        jax.profiler.start_trace(tc.profile_out_dir)

    t0 = time.time()
    with mesh:
        for step in range(start_step, max_steps):
            host_batch = next(it)
            batch = {
                k: (
                    jax.device_put(
                        v, batch_sharding(mesh, np.ndim(v), batch_size=len(v))
                    )
                    if k in ("target_pixels", "ref_pixels", "input_ids",
                             "attention_mask", "weight_mask")
                    else v
                )
                for k, v in host_batch.items()
            }
            if pooled_row is not None:
                bsz = batch["target_pixels"].shape[0]
                batch["pooled_embeds"] = jnp.broadcast_to(
                    pooled_row, (bsz, pooled_row.shape[-1])
                )
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, frozen, vae_params, batch, step_rng)

            if ema is not None and (step + 1) % tc.ema_update_freq == 0:
                decay = ema_decay_for_step(
                    state["step"], decay=tc.ema_decay,
                    update_after_step=tc.ema_update_after_step,
                )
                ema = ema_update(ema, state["train"], decay)

            if (step + 1) % tc.logging_steps == 0 or step == start_step:
                loss = float(metrics["loss"])
                gn = float(metrics["grad_norm"])
                dt = (time.time() - t0) / max(step - start_step + 1, 1)
                log.info("step %d loss %.4f grad_norm %.3f %.2fs/it", step + 1, loss, gn, dt)
                metrics_out = {"loss": loss, "grad_norm": gn, "sec_per_it": dt}

            if (step + 1) % tc.checkpointing_steps == 0:
                ckpt.save(manager, step + 1, {"state": state, "ema": ema})

            if tc.validation_steps and (step + 1) % tc.validation_steps == 0:
                try:
                    _run_validation_probes(
                        cfg, state, frozen, vae_params, qcfg, fcfg, vcfg, step + 1
                    )
                except Exception as e:  # validation must never kill training
                    log.warning("validation failed at step %d: %s", step + 1, e)

    if tc.profile_out_dir:
        jax.profiler.stop_trace()
    manager.wait_until_finished()
    metrics_out["final_step"] = max_steps
    return metrics_out
