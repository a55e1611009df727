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
    remat = cfg.training_config.gradient_checkpointing
    if mc.tiny:
        qcfg = Qwen2p5VLConfig.tiny()
        fcfg = dataclasses.replace(
            FluxConfig.tiny(), joint_attention_dim=qcfg.projector_out,
            remat=remat, rope_dtype=mc.rope_dtype,
            attention_impl=mc.attention_impl, remat_policy=mc.remat_policy,
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
    fcfg = dataclasses.replace(
        FluxConfig(), remat=remat, rope_dtype=mc.rope_dtype,
        attention_impl=mc.attention_impl, remat_policy=mc.remat_policy,
    )
    vcfg = VaeConfig()
    qwen, flux = load_merged_checkpoint(mc.pretrained_lvlm_name_or_path, qcfg, fcfg)
    vae_src = TensorSource.from_dir(mc.pretrained_denoiser_name_or_path)
    vae_params = convert_vae(vae_src, vcfg)
    return qcfg, fcfg, vcfg, {"qwen": qwen, "flux": flux}, vae_params


def data_iterator(
    cfg: TrainDenoiseConfig, qcfg, vcfg=None, *, seed_offset: int = 0
) -> Iterator[Dict[str, Any]]:
    """``seed_offset`` reseeds the SHUFFLE stream only (sample content stays
    keyed to the dataset seed). The trainer passes the resume step here so a
    resumed run draws a fresh epoch permutation instead of replaying the
    epoch head it already trained on — the reference replays (accelerate
    load_state restores no sampler state and no skip_first_batches is used,
    ref:train_denoiser.py:768-770)."""
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
        ocr_enhancer=dc.ocr_enhancer,
        use_step1x=dc.use_step1x_preprocessing,
        resolution_buckets=dc.resolution_buckets,
        notry=dc.notry,
    )
    coll = Collator(qcfg.vision, padding_side=dc.padding_side)
    from gpt_image_edit_tpu.data.loader import BatchLoader

    loader = BatchLoader(
        ds, coll,
        batch_size=dc.batch_size,
        num_workers=dc.num_workers,
        seed=cfg.training_config.seed + seed_offset,
    )
    yield from loader


def _config_probes(cfg):
    """Probe list from `dataset_config.validation_probes` (the reference's 13
    named validation_*_prompt/path slots fold into this at config-load time,
    ref:configuration_denoise.py:77-117); falls back to one synthetic probe
    in random_data/tiny smoke mode."""
    from gpt_image_edit_tpu.training.validation import ValidationProbe

    entries = cfg.dataset_config.validation_probes
    if entries:
        return [ValidationProbe(**e) for e in entries]
    return [ValidationProbe(name="synthetic", prompt="make the sky dramatic")]


def _run_validation_probes(
    cfg, state, frozen, vae_params, qcfg, fcfg, vcfg, step, pooled_row=None, ema=None
):
    """Periodic probe-image generation (ref:train_denoiser.py:1243-1352).
    `pooled_row` is the real empty-prompt CLIP pooled embedding when available
    (the reference's validation conditioning, ref:train_denoiser.py:1458-1468);
    `ema` swaps in EMA weights when `training_config.validation_with_ema`."""
    from gpt_image_edit_tpu.data import constants as C
    from gpt_image_edit_tpu.data.image_processing import preprocess_vit_patches
    from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
    from gpt_image_edit_tpu.models.qwen2p5vl import apply_qwen, vision
    from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index
    from gpt_image_edit_tpu.training.validation import run_validation

    dc = cfg.dataset_config
    tok = load_tokenizer(
        "fake" if (dc.random_data or cfg.model_config.tiny)
        else cfg.model_config.pretrained_lvlm_name_or_path
    )

    probes = _config_probes(cfg)
    if ema is not None and cfg.training_config.validation_with_ema:
        state = dict(state, train=ema)

    def encode_prompt_fn(params, prompt, images):
        value = "<image>" * len(images) + prompt
        text = (
            f"<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            f"<|im_start|>user\n{value}<|im_end|>\n<|im_start|>assistant\n"
            + C.SPECIAL_TOKENS["image_begin_token"]
        )
        patches, grids = [], []
        for image in images:
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
            patches.append(flat)
            grids.append(grid)
        grid_arr = np.asarray(grids, np.int64) if grids else None
        ids = np.asarray([tok.encode(text)], np.int64)
        attn = np.ones_like(ids)
        pos, _ = get_rope_index(
            ids, grid_arr, attn,
            spatial_merge_size=qcfg.vision.spatial_merge_size,
            image_token_id=qcfg.image_token_id,
            video_token_id=qcfg.video_token_id,
            vision_start_token_id=qcfg.vision_start_token_id,
        )
        kwargs = {}
        if patches:
            kwargs = dict(
                pixel_patches=jnp.asarray(np.concatenate(patches, 0)),
                vision_aux=vision.vision_precompute(grid_arr, qcfg.vision),
            )
        embeds = apply_qwen(
            params["qwen"], qcfg,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            attention_mask=jnp.asarray(attn), output_type="denoise_embeds",
            **kwargs,
        )
        if pooled_row is not None:
            pooled = jnp.broadcast_to(pooled_row, (1, pooled_row.shape[-1]))
        else:
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


def export_ema_hf(cfg, ema, frozen, qcfg, fcfg, step):
    """Write the EMA weights as an HF-format merged checkpoint under
    output_dir/model_ema/ — the TPU analogue of the reference's save-state
    pre-hook model_ema export (ref:train_denoiser.py:489-509). EMA covers the
    trainable subtree; frozen leaves complete the pytree."""
    import os

    from gpt_image_edit_tpu.training.train_step import combine_params
    from gpt_image_edit_tpu.utils.ckpt_export import save_merged_checkpoint

    merged = combine_params(ema, frozen)
    out = os.path.join(cfg.training_config.output_dir, "model_ema")
    save_merged_checkpoint(out, merged["qwen"], merged["flux"], qcfg, fcfg)
    log.info("EMA HF export at step %d -> %s", step, out)


def train(
    cfg: TrainDenoiseConfig,
    max_steps: Optional[int] = None,
    preemption_guard=None,
) -> Dict[str, Any]:
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
    if mc.quantize_frozen:
        # int8/int4 weight-only frozen subtree: halves/quarters the frozen
        # VLM's HBM footprint (the 78GB/GPU stage-2 pressure, BASELINE.md);
        # activations still differentiate through the dequantized matmul.
        from gpt_image_edit_tpu.utils.quantize import quantize_params

        fmode = "int4" if mc.quantize_frozen == "int4" else "weight_only"
        frozen = quantize_params(frozen, mode=fmode)
        log.info("frozen subtree quantized (%s weight-only)", fmode)
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
    text_encoders = None
    if not mc.tiny and mc.pretrained_denoiser_name_or_path:
        from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

        # Lazy container: touching .clip below loads ONLY the CLIP-L encoder
        # (~120M params); T5-XXL stays unloaded unless drop_t5_rate < 1.
        # A real (non-tiny) run must not silently fall back to zeros — that
        # would diverge from the reference, which always feeds the real
        # empty-prompt pooled row (ref:train_denoiser.py:795-805).
        text_encoders = FluxTextEncoders(mc.pretrained_denoiser_name_or_path)
        pooled_row = text_encoders.encode_clip_pooled([""])
        log.info("empty-prompt CLIP pooled embeds ready")

    # T5 prefix conditioning: with prob (1 - drop_t5_rate) the last-turn
    # instruction is T5-encoded each step (ref:train_denoiser.py:860-869).
    if tc.drop_t5_rate < 1.0 and text_encoders is None:
        raise ValueError(
            "drop_t5_rate < 1.0 needs the FLUX text encoders "
            "(set model_config.pretrained_denoiser_name_or_path, non-tiny)"
        )
    import random as _random

    t5_rng = _random.Random(tc.seed)

    it = data_iterator(cfg, qcfg, vcfg, seed_offset=start_step)
    rng = jax.random.key(tc.seed)
    metrics_out: Dict[str, Any] = {}
    from gpt_image_edit_tpu.training.metrics import MetricsLogger, prodigy_d
    from gpt_image_edit_tpu.training.optimizer import lr_schedule

    mlog = MetricsLogger(tc.output_dir, tc.report_to,
                         run_config=dataclasses.asdict(cfg))
    schedule = lr_schedule(tc)

    if tc.profile_out_dir:
        jax.profiler.start_trace(tc.profile_out_dir)

    t0 = time.time()
    pending = []  # (step, device-metrics) awaiting fetch
    completed = start_step
    from gpt_image_edit_tpu.training.preemption import PreemptionGuard

    guard = preemption_guard if preemption_guard is not None else PreemptionGuard()
    with guard, jax.sharding.set_mesh(mesh):  # set_mesh: ring attention (attention_impl="ring") resolves the ambient mesh from this context
        for step in range(start_step, max_steps):
            host_batch = next(it)
            instructions = host_batch.pop("instructions", None)
            host_batch.pop("labels", None)  # CE labels: unused by the denoiser loss
            batch = {
                k: (
                    jax.device_put(
                        v, batch_sharding(mesh, np.ndim(v), batch_size=len(v))
                    )
                    if k in ("target_pixels", "ref_pixels", "input_ids",
                             "attention_mask", "weight_mask", "ref_valid")
                    else v
                )
                for k, v in host_batch.items()
            }
            bsz = batch["target_pixels"].shape[0]
            if pooled_row is not None:
                batch["pooled_embeds"] = jnp.broadcast_to(
                    pooled_row, (bsz, pooled_row.shape[-1])
                )
            if (
                tc.drop_t5_rate <= t5_rng.random()
                and text_encoders is not None
                and instructions is not None
            ):
                batch["t5_embeds"] = text_encoders.encode_t5(
                    list(instructions), max_length=256
                )
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, frozen, vae_params, batch, step_rng)

            if ema is not None and (step + 1) % tc.ema_update_freq == 0:
                decay = ema_decay_for_step(
                    state["step"], decay=tc.ema_decay,
                    update_after_step=tc.ema_update_after_step,
                )
                ema = ema_update(ema, state["train"], decay)

            # Per-step metrics are recorded EVERY step (parity with the
            # reference's wandb tracking) but only fetched from device at the
            # logging interval — float() each step would sync the pipeline.
            pending.append((step + 1, metrics))
            if (step + 1) % tc.logging_steps == 0 or step == start_step:
                loss = gn = None
                for s, m in pending:
                    loss, gn = float(m["loss"]), float(m["grad_norm"])
                    lr = float(schedule(s - 1))
                    d = prodigy_d(state["opt"]) if tc.optimizer == "prodigy" else None
                    mlog.log(s, {
                        "train_loss": loss, "grad_norm": gn, "lr": lr,
                        "prodigy_d": d,
                        "prodigy_d_lr": (d * lr) if d is not None else None,
                    })
                pending.clear()
                dt = (time.time() - t0) / max(step - start_step + 1, 1)
                log.info("step %d loss %.4f grad_norm %.3f lr %.2e %.2fs/it",
                         step + 1, loss, gn, float(schedule(step)), dt)
                metrics_out = {"loss": loss, "grad_norm": gn, "sec_per_it": dt}

            if (step + 1) % tc.checkpointing_steps == 0:
                ckpt.save(manager, step + 1, {"state": state, "ema": ema})
                if ema is not None and tc.export_ema_hf:
                    try:
                        export_ema_hf(cfg, ema, frozen, qcfg, fcfg, step + 1)
                    except Exception as e:  # export must never kill training
                        log.warning("EMA HF export failed at %d: %s", step + 1, e)

            if tc.validation_steps and (step + 1) % tc.validation_steps == 0:
                try:
                    _run_validation_probes(
                        cfg, state, frozen, vae_params, qcfg, fcfg, vcfg, step + 1,
                        pooled_row=pooled_row, ema=ema,
                    )
                except Exception as e:  # validation must never kill training
                    log.warning("validation failed at step %d: %s", step + 1, e)

            completed = step + 1
            if guard.triggered:
                # SIGTERM (preemptible-slice eviction notice): the in-flight
                # step finished above — persist it unless the periodic save
                # just did, then exit cleanly for resume_from_checkpoint.
                if (step + 1) % tc.checkpointing_steps != 0:
                    ckpt.save(manager, step + 1, {"state": state, "ema": ema})
                log.warning(
                    "preemption: checkpoint at step %d written, exiting", step + 1
                )
                metrics_out["preempted_at"] = step + 1
                break

    # flush metrics recorded after the last logging-interval boundary
    for s, m in pending:
        mlog.log(s, {
            "train_loss": float(m["loss"]),
            "grad_norm": float(m["grad_norm"]),
            "lr": float(schedule(s - 1)),
        })
    pending.clear()
    if tc.profile_out_dir:
        jax.profiler.stop_trace()
    mlog.close()
    manager.wait_until_finished()
    metrics_out["final_step"] = completed if completed > start_step else max_steps
    return metrics_out
