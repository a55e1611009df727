"""Serving runtime: merged checkpoint -> chat -> edit image / text answer.

Covers ref:univa/serve/cli.py's flow: ChatML conversation, LVLM
denoise_embeds, task-head generate-vs-understand routing (:199-207),
FluxKontext sampling with history images as conditioning (:210-254), and an
LM generate branch (:256-267)."""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.image_processing import preprocess_vae_image
from gpt_image_edit_tpu.data.prompter import Qwen2VLPrompter
from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
from gpt_image_edit_tpu.models.qwen2p5vl import (
    Qwen2p5VLConfig,
    apply_qwen,
    init_qwen,
)
from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
from gpt_image_edit_tpu.pipeline.kontext import (
    KontextPipeline,
    pick_kontext_resolution,
    postprocess_to_uint8,
)

log = logging.getLogger("gie_tpu.serve")


def update_size(img: Optional[Image.Image], default: int = 1024) -> Tuple[int, int]:
    """Adaptive output size from the input aspect (ref:cli.py:82-97), snapped
    to the Kontext bucket table."""
    if img is None:
        return default, default
    w, h = pick_kontext_resolution(img.width, img.height)
    return h, w


class UnivaRuntime:
    def __init__(
        self,
        model_path: Optional[str] = None,
        flux_path: Optional[str] = None,
        *,
        tiny: bool = False,
        seed: int = 0,
        quantize: Optional[str] = None,  # "int8" weight-only | "w8a8" int8-MXU
        joint_with_t5: bool = True,      # concat T5 after LVLM embeds (ref default)
        scan_unroll: int = 1,            # FluxConfig.scan_unroll: partial block-
        # scan unroll (k bodies/iter; overlaps param slicing with compute)
        unroll_blocks: bool = False,     # FluxConfig.scan_blocks=False: unrolled
        # per-layer static slices instead of the block scan (serving perf
        # experiment; numerics identical up to quant-step noise, tested)
        vae_dtype: str = "bfloat16",     # reference serves the VAE in bf16
        # (ref:univa/serve/cli.py:39,67); fp32 stats in group_norm keep the
        # bf16 path numerically benign (tested). "float32" opts out.
        quantize_vlm: "bool | str" = False,  # int8 VLM trunk (single-
        # 16GB-chip serving: 7GB trunk + 12GB quantized FLUX via host swap)
        quantize_t5: Optional[str] = None,  # "int8" | "int4" weight-only
        # T5-XXL trunk — under --offload the bf16 T5 is a 9.4GB per-request
        # staging chunk (second only to FLUX); int8 halves it, int4 quarters
        # it, and the frozen encoder's ~60ms compute is noise either way
        offload: bool = False,           # the reference's --offload
        # (ref:app.py:37,177-178 enable_model_cpu_offload), TPU-native:
        # VLM/FLUX/VAE params park in pinned_host memory and stage into HBM
        # only for the stage that uses them — peak-HBM = one component
        synthetic_full: bool = False,    # full-SIZE shape-only weights
        # (no public checkpoints ship in this environment): 7B VLM + 12B
        # FLUX + VAE + T5/CLIP built directly at serving dtypes
        # (utils/synthetic.py) — hardware rehearsal of the quantized
        # serving path incl. --offload staging and the load-test numbers.
        # Single 16GB chip requires --offload (components stage in turn).
        mesh=None,                       # jax.sharding.Mesh: multi-chip
        # serving — VLM/FLUX/VAE params shard over (fsdp, tensor) via
        # parallel.sharding rules, GSPMD inserts the ICI collectives
        # (the reference has no multi-GPU serving; its 19B stack is
        # single-device or CPU-offloaded). Text encoders stay replicated.
    ):
        from gpt_image_edit_tpu.utils.offload import ComponentStore

        if mesh is not None and offload:
            raise ValueError("offload and mesh sharding are mutually exclusive")
        self.mesh = mesh
        self.offload = offload
        self._store = ComponentStore(enabled=offload)
        self.prompter = Qwen2VLPrompter()
        self.history_images: List[Image.Image] = []
        # ViT view pixel budget (448^2 like ref:cli.py:33-34; tiny grids scale down)

        flux_prequantized = False
        synthetic_loaded = synthetic_full and not model_path and not tiny
        if synthetic_loaded:
            from gpt_image_edit_tpu.utils.synthetic import (
                quantized_shape_params, shape_params,
            )

            log.info("loading SYNTHETIC full-size shape-only weights "
                     "(hardware perf rehearsal; no checkpoints in this env)")
            self.qcfg, self.vcfg = Qwen2p5VLConfig(), VaeConfig()
            self.fcfg = dataclasses.replace(FluxConfig(), rope_dtype="bfloat16")
            place = self._store.placement
            vlm_mode = quantize_vlm or "int8"  # 14GB bf16 trunk never fits
            qabs = jax.eval_shape(
                lambda k: init_qwen(k, self.qcfg), jax.random.key(0)
            )
            self.qwen_params = quantized_shape_params(
                qabs,
                qkey={"w8a8": "q_w8a8", "int4": "q4"}.get(vlm_mode, "q"),
                float_dtype=jnp.bfloat16, place=place,
            )
            fabs = jax.eval_shape(
                lambda k: init_flux(k, self.fcfg, jnp.bfloat16),
                jax.random.key(1),
            )
            fqkey = {"int8": "q", "int4": "q4", None: None}.get(
                quantize, "q_w8a8"
            )
            if fqkey is None:
                flux_params = shape_params(
                    fabs, float_dtype=jnp.bfloat16, place=place
                )
            else:
                flux_params = quantized_shape_params(
                    fabs, qkey=fqkey, float_dtype=jnp.bfloat16, place=place
                )
                flux_prequantized = True
            vabs = jax.eval_shape(
                lambda k: init_vae(k, self.vcfg), jax.random.key(2)
            )
            vae_params = shape_params(
                vabs,
                float_dtype=(jnp.bfloat16 if vae_dtype == "bfloat16" else None),
                place=place,
            )
            self.tokenizer = load_tokenizer("fake")
            self.vit_pixels = 200704
        elif tiny or not model_path:
            log.info("loading TINY random-weight models (demo mode)")
            self.qcfg = Qwen2p5VLConfig.tiny()
            self.fcfg = dataclasses.replace(
                FluxConfig.tiny(), joint_attention_dim=self.qcfg.projector_out
            )
            self.vcfg = VaeConfig.tiny()
            self.qwen_params = init_qwen(jax.random.key(0), self.qcfg)
            flux_params = init_flux(jax.random.key(1), self.fcfg)
            vae_params = init_vae(jax.random.key(2), self.vcfg)
            self.tokenizer = load_tokenizer("fake")
            self.vit_pixels = 3136
        else:
            from gpt_image_edit_tpu.utils.ckpt_convert import (
                TensorSource,
                convert_vae,
                load_merged_checkpoint,
            )

            # serving computes in bf16; bf16 rope tables measured -8..-11%
            # step time at +0.17% rel err (4x below bf16's own rounding)
            self.qcfg, self.vcfg = Qwen2p5VLConfig(), VaeConfig()
            self.fcfg = dataclasses.replace(FluxConfig(), rope_dtype="bfloat16")
            # offload: convert host-side and park straight into pinned_host
            # (the device never transiently holds the full-precision trees;
            # the reference's cpu_offload likewise loads on CPU)
            self.qwen_params, flux_params = load_merged_checkpoint(
                model_path, self.qcfg, self.fcfg,
                placement=self._store.placement,
            )
            vae_dir = flux_path or model_path
            vae_params = convert_vae(
                TensorSource.from_dir(f"{vae_dir}/vae"), self.vcfg,
                placement=self._store.placement,
            )
            self.tokenizer = load_tokenizer(model_path)
            self.vit_pixels = 200704

        if vae_dtype not in ("bfloat16", "float32"):
            raise ValueError(f"vae_dtype must be bfloat16|float32, got {vae_dtype!r}")
        if vae_dtype == "bfloat16" and not synthetic_loaded:  # synthetic is
            # already built at the requested dtype (a no-op cast would still
            # rebuild + re-park the tree)
            from gpt_image_edit_tpu.models.common import cast_floating

            vae_params = cast_floating(vae_params, jnp.bfloat16)
            if offload:  # re-park: eager cast outputs land in device memory
                vae_params = jax.device_put(vae_params, self._store.placement)

        if quantize in ("int8", "int4", "w8a8", "w8a8-attn", "w8a8-qk8"):
            from gpt_image_edit_tpu.utils.quantize import quantize_params

            mode = {"int8": "weight_only", "int4": "int4"}.get(quantize, "w8a8")
            # tiny demo kernels are all below the production min_size; lower
            # it so --quantize actually exercises the quantized path there.
            # Under --offload, park each quantized subtree as it is built
            # (place=) so the transient device footprint stays ~one kernel.
            if not flux_prequantized:  # synthetic trees are built quantized
                log.info("quantizing FLUX weights (%s)", mode)
                flux_params = quantize_params(
                    flux_params, mode=mode,
                    min_size=1024 if (tiny or not model_path) else (1 << 20),
                    place=self._store.placement,
                )
            if quantize == "w8a8-attn":
                # EXPERIMENTAL: full int8 Pallas attention kernel. Measured
                # SLOWER than the bf16 kernel on v5e (1174 vs 1049 ms/step
                # full model: the kernel is exp/VPU-bound, not MXU-bound),
                # kept for hardware where int8 MXU headroom dominates.
                self.fcfg = dataclasses.replace(
                    self.fcfg, attention_impl="pallas_int8"
                )
            elif quantize == "w8a8-qk8":
                # int8 QK^T only (q/k are RMS-normalized -> benign per-row
                # quant), PV stays bf16
                self.fcfg = dataclasses.replace(
                    self.fcfg, attention_impl="pallas_qk8"
                )
        elif quantize:
            raise ValueError(
                f"unknown quantize mode {quantize!r} "
                "(int8 | int4 | w8a8 | w8a8-attn | w8a8-qk8)"
            )

        if quantize_vlm:
            # int8 on the frozen VLM trunk: 7B bf16 (14GB) does not
            # co-reside with the quantized 12B FLUX on one 16GB chip;
            # int8 (7GB) is what makes single-chip full serving feasible.
            # quantize_vlm=True|"int8" -> weight-only (bf16 activations; the
            # trunk is a frozen feature extractor, error budget matches the
            # FLUX weight-only mode's <0.1%/forward, test_quantize).
            # quantize_vlm="w8a8" -> int8 MXU matmuls for the prefill-bound
            # e2e path (same dynamic per-row activation quant as FLUX W8A8).
            from gpt_image_edit_tpu.utils.quantize import quantize_params

            # quantize_vlm="int4" -> 4-bit weight-only (group-64 scales):
            # halves the staged bytes vs int8 (~8.3GB -> ~4.6GB incl. the
            # bf16 embed table) — the offload lever, since staging traffic
            # dominates the non-scan serving overhead, at bf16-activation
            # prefill compute (no int8 MXU).
            vlm_mode = {"w8a8": "w8a8", "int4": "int4"}.get(
                quantize_vlm, "weight_only"
            )
            if quantize_vlm not in (True, "int8", "w8a8", "int4"):
                raise ValueError(
                    f"quantize_vlm must be True | 'int8' | 'w8a8' | 'int4', "
                    f"got {quantize_vlm!r}"
                )
            if not synthetic_loaded:  # synthetic VLM is built quantized
                log.info("quantizing VLM weights (%s)", vlm_mode)
                self.qwen_params = quantize_params(
                    self.qwen_params, mode=vlm_mode, min_size=1 << 20,
                    place=self._store.placement,
                )
        if unroll_blocks:
            self.fcfg = dataclasses.replace(self.fcfg, scan_blocks=False)
        elif scan_unroll > 1:
            self.fcfg = dataclasses.replace(self.fcfg, scan_unroll=scan_unroll)

        # generate-vs-understand routing head (ref:cli.py:42-49), if shipped
        self.task_head = None
        if model_path:
            import os

            th_path = os.path.join(model_path, "task_head_final.pt")
            if os.path.exists(th_path):
                from gpt_image_edit_tpu.serve.task_head import load_task_head

                self.task_head = load_task_head(th_path)
                log.info("loaded task head from %s", th_path)

        if mesh is not None:
            # shard AFTER quantization so the int8/int4 payloads (not the
            # bf16 masters) are what lands distributed across HBMs
            from gpt_image_edit_tpu.parallel.sharding import shard_params

            self.qwen_params = shard_params(self.qwen_params, mesh)

        self.qwen_params = self._store.add("vlm", self.qwen_params)
        # the reference pairs --offload with vae slicing (ref:app.py:177-179)
        self.pipe = KontextPipeline(
            flux_params, self.fcfg, vae_params, self.vcfg,
            offload=offload, vae_slicing=offload, mesh=mesh,
        )
        self.rng = jax.random.key(seed)

        # FLUX text encoders for real CLIP pooled embeds (+ optional T5
        # concat) — the reference always loads these for serving
        # (ref:univa/serve/cli.py:121,220-233). Lazy container: T5-XXL only
        # materializes if joint_with_t5 is used.
        self.joint_with_t5 = joint_with_t5
        self.quantize_t5 = quantize_t5
        self.text_encoders = None
        if synthetic_loaded:
            from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

            self.text_encoders = FluxTextEncoders(
                "<synthetic>",
                offload_store=self._store if self.offload else None,
                synthetic=True, quantize_t5=quantize_t5,
            )
            log.info("synthetic FLUX text encoders (T5-XXL + CLIP-L shapes)")
        enc_dir = flux_path or model_path
        if enc_dir and not tiny:
            import os

            if os.path.isdir(os.path.join(enc_dir, "text_encoder")):
                self.load_text_encoders(enc_dir)
                log.info("FLUX text encoders available at %s", enc_dir)
            else:
                log.warning(
                    "no text_encoder/ under %s: pooled embeds fall back to "
                    "zeros (DIVERGES from the reference serving path)", enc_dir
                )

    # ------------------------------------------------------------------
    def _qwen(self):
        """Device-resident VLM params (stages the pinned_host master into
        HBM in offload mode)."""
        return self._store.stage("vlm")

    def _evict_vlm(self):
        """Drop the VLM (+ text encoder) HBM copies before the FLUX scan /
        at the end of text-only entry points (offload mode). The pipeline
        syncs on the conditioning tensors before staging FLUX, so in-flight
        consumers finish before fresh HBM is committed."""
        self._store.evict("vlm")
        # injected stand-in encoders (tests, T5-only ablation) may not
        # implement the offload protocol
        evict = getattr(self.text_encoders, "evict", None)
        if evict is not None:
            evict()

    def reset_staging(self) -> None:
        """Recovery hook for batch-executor fallback: drop EVERY staged HBM
        copy (offload mode). A batched scan that fails at trace/lowering
        time leaves FLUX staged with the VLM already evicted; re-running
        the requests serially then re-stages the VLM on top of the resident
        FLUX weights and OOMs one 16GB chip (observed in the max_batch=2
        serving bench: a Pallas lowering reject poisoned the whole process
        via the follow-up RESOURCE_EXHAUSTED). No-op when offload is off."""
        if not self.offload:
            return
        self._store.evict_all()
        evict = getattr(self.text_encoders, "evict", None)
        if evict is not None:
            evict()

    def stage_timings(self) -> dict:
        """Cumulative host->HBM staging wall time per offloaded component
        (merges the runtime store — vlm/t5/clip — with the pipeline's
        flux/vae store). The serving-latency breakdown tool: SERVING_r05
        measured ~18s/request of non-scan overhead; these counters say how
        much of it is pinned-host restaging traffic."""
        out: dict = {}
        stores = [self._store]
        pipe_store = getattr(getattr(self, "pipe", None), "_store", None)
        if pipe_store is not None:
            stores.append(pipe_store)
        for st in stores:
            for name, sec in getattr(st, "stage_seconds", {}).items():
                out[name] = {
                    "s": round(sec, 3),
                    "n": st.stage_counts.get(name, 0),
                }
        return out

    def _offload_text_boundary(self, embeds) -> None:
        """offload: the int8 VLM (~8.3GB incl. its bf16 embed table) plus
        the int8 T5-XXL (~5GB) exceed one 16GB chip once ViT/prefill
        workspace is added (observed RESOURCE_EXHAUSTED in --synthetic_full
        serving warmup at 1024^2) — barrier on the prefill outputs and free
        the VLM HBM copy BEFORE _text_cond stages T5, so the text stage is
        itself two sequential sub-stages. Evicts only the VLM (not the text
        encoders: _neg_cond re-enters with T5 already staged and would pay a
        pointless re-stage). No-op when offload is off."""
        if not self.offload:
            return
        from gpt_image_edit_tpu.utils.offload import sync as _sync

        _sync(embeds)
        self._store.evict("vlm")

    # ------------------------------------------------------------------
    def _prepare_inputs(
        self,
        conversation,
        images: List[Image.Image],
        *,
        gen_trigger: bool = False,
    ):
        """ONE prompt-preprocessing path for encode/route/answer — shared
        with the local judge via data.chat_prep.prepare_chat_inputs
        (ref:cli.py:185-196). Returns (model_kwargs, rope_deltas)."""
        from gpt_image_edit_tpu.data.chat_prep import prepare_chat_inputs

        return prepare_chat_inputs(
            self.prompter, self.tokenizer, self.qcfg, conversation, images,
            vit_pixels=self.vit_pixels, gen_trigger=gen_trigger,
        )

    def _encode_prompt(self, conversation, images: List[Image.Image]):
        """ChatML + <image> expansion -> LVLM denoise_embeds."""
        kwargs, _ = self._prepare_inputs(conversation, images, gen_trigger=True)
        embeds = apply_qwen(
            self._qwen(), self.qcfg, output_type="denoise_embeds", **kwargs
        )
        return embeds, kwargs

    def _text_cond(self, text: str):
        """(t5_embeds | None, pooled (1, D)) for the pipeline. The reference
        ALWAYS feeds real CLIP pooled embeds of the instruction (or '' in the
        no-T5 ablation) and concatenates T5 embeds after the LVLM rows
        (ref:univa/serve/cli.py:220-233); zeros only in tiny demo mode."""
        if self.text_encoders is not None:
            text = text if self.joint_with_t5 else ""
            t5, pooled = self.text_encoders.encode_prompt([text], 256)
            return (t5 if self.joint_with_t5 else None), pooled
        return None, jnp.zeros((1, self.fcfg.pooled_projection_dim), jnp.bfloat16)

    def _neg_cond(self, negative_prompt: str):
        """True-CFG negative branch: the hardcoded unconditional prompt
        (ref:train_denoiser.py:1458-1468, flux_pipeline true_cfg); the branch
        carries its own pad mask + rope length. Returns bf16
        (neg_embeds, neg_pooled, neg_txt_pad_mask), each batch-1."""
        neg_embeds, neg_txt_pad_mask = self._neg_cond_prefill(negative_prompt)
        self._offload_text_boundary(neg_embeds)
        return self._neg_cond_text(
            negative_prompt, neg_embeds, neg_txt_pad_mask
        )

    def _neg_cond_prefill(self, negative_prompt: str):
        """VLM-prefill half of the negative branch (split for edit_batch's
        one-VLM-stage pass; see _prep_edit_prefill)."""
        neg_convo = [{"from": "user", "value": negative_prompt}]
        neg_embeds, neg_kwargs = self._encode_prompt(neg_convo, [])
        return neg_embeds, neg_kwargs["attention_mask"]

    def _neg_cond_text(self, negative_prompt: str, neg_embeds,
                       neg_txt_pad_mask):
        """T5/CLIP half of the negative branch; caller must have passed the
        offload text boundary first."""
        neg_t5, neg_pooled = self._text_cond(negative_prompt)
        if neg_t5 is not None:
            neg_embeds = jnp.concatenate(
                [neg_embeds, neg_t5.astype(neg_embeds.dtype)], axis=1
            )
            neg_txt_pad_mask = jnp.concatenate(
                [neg_txt_pad_mask,
                 jnp.ones((1, neg_t5.shape[1]), neg_txt_pad_mask.dtype)],
                axis=1,
            )
        return (
            neg_embeds.astype(jnp.bfloat16),
            neg_pooled.astype(jnp.bfloat16),
            neg_txt_pad_mask,
        )

    @staticmethod
    def _as_image_list(image) -> list:
        return (
            list(image) if isinstance(image, (list, tuple))
            else ([image] if image is not None else [])
        )

    def _resolve_shapes(self, images, height, width):
        """Pure-host shape resolution for one request: output (height, width)
        and per-ref cond buckets [(bh, bw), ...]. Shared by _prep_edit and
        edit_batch's cheap pre-prefill compatibility check."""
        first = images[0] if images else None
        if height is None or width is None:
            height, width = update_size(first)
        if self.vcfg.downscale != 8:  # tiny demo: keep it small
            height = width = 8 * self.vcfg.downscale
        buckets = []
        for im in images:
            bw, bh = pick_kontext_resolution(im.width, im.height)
            if self.vcfg.downscale != 8:
                bw = bh = height
            buckets.append((bh, bw))
        return height, width, buckets

    def batch_shape_key(self, image=None, height=None, width=None):
        """PUBLIC batch-compatibility key: two edit requests with equal keys
        share every static shape and may run in one edit_batch group (used
        by eval/gen_samples and available to custom schedulers; the HTTP
        layer's edit_signature adds the step/CFG knobs on top)."""
        h, w, buckets = self._resolve_shapes(
            self._as_image_list(image), height, width
        )
        return (h, w, tuple(buckets))

    def _prep_edit_prefill(self, instruction: str, image=None):
        """VLM-prefill half of _prep_edit: LVLM embeds + pad mask for one
        request. Split out so edit_batch can run EVERY prefill while the VLM
        is staged ONCE (offload: re-staging the int8 VLM per request with T5
        still resident OOM'd one 16GB chip — observed RESOURCE_EXHAUSTED in
        the ViT scan at max_batch=2, SERVING bench 2026-08-19)."""
        images = self._as_image_list(image)
        value = "<image>" * len(images) + instruction
        conversation = [{"from": "user", "value": value}]
        embeds, enc_kwargs = self._encode_prompt(conversation, images)
        return images, embeds, enc_kwargs["attention_mask"]

    def _prep_edit_text(
        self,
        instruction: str,
        images,
        embeds,
        txt_pad_mask,
        *,
        height: Optional[int] = None,
        width: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> dict:
        """Text-encoder half of _prep_edit (T5 suffix + CLIP pooled row,
        ref:cli.py:220-233) plus host-side cond/shape/rng prep. Caller must
        have passed the offload text boundary (VLM evicted) first."""
        t5_embeds, pooled = self._text_cond(instruction)
        if t5_embeds is not None:
            embeds = jnp.concatenate(
                [embeds, t5_embeds.astype(embeds.dtype)], axis=1
            )
            txt_pad_mask = jnp.concatenate(
                [txt_pad_mask, jnp.ones((1, t5_embeds.shape[1]), txt_pad_mask.dtype)],
                axis=1,
            )

        height, width, buckets = self._resolve_shapes(images, height, width)
        conds = [
            jnp.asarray(preprocess_vae_image(im, bh, bw))[None]
            for im, (bh, bw) in zip(images, buckets)
        ]

        if seed is not None:
            # seeded requests must NOT write back to the shared stream: one
            # client's seed would otherwise determine every later unseeded
            # request's "random" noise (server-wide determinism leak)
            sample_rng = jax.random.split(jax.random.key(seed))[1]
        else:
            self.rng, sample_rng = jax.random.split(self.rng)
        return {
            "embeds": embeds,
            "txt_pad_mask": txt_pad_mask,
            "pooled": pooled,
            "conds": conds,
            "height": height,
            "width": width,
            "rng": sample_rng,
        }

    def _prep_edit(
        self,
        instruction: str,
        image=None,
        *,
        height: Optional[int] = None,
        width: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> dict:
        """Per-request host + VLM-prefill prep shared by edit()/chat paths:
        LVLM embeds (+T5 suffix), pad mask, pooled row, per-ref VAE-ready
        cond pixels, resolved output size, and the sample rng."""
        images, embeds, txt_pad_mask = self._prep_edit_prefill(
            instruction, image
        )
        self._offload_text_boundary(embeds)
        return self._prep_edit_text(
            instruction, images, embeds, txt_pad_mask,
            height=height, width=width, seed=seed,
        )

    # ------------------------------------------------------------------
    def edit(
        self,
        instruction: str,
        image=None,  # PIL.Image, list of PIL.Images (multi-ref), or None (t2i)
        *,
        steps: int = 28,
        guidance: float = 3.5,
        true_cfg_scale: float = 1.0,
        negative_prompt: str = "Generate an image.",
        height: Optional[int] = None,
        width: Optional[int] = None,
        seed: Optional[int] = None,
        step_callback=None,  # host fn(step_idx): UI progress (ref:app.py:308-313)
        num_images_per_prompt: int = 1,  # batched sampling (ref:app.py:318-325)
    ):
        # both VLM prefills (positive + negative) run while the VLM is
        # staged once, THEN the text boundary evicts it before T5 stages —
        # _neg_cond after _prep_edit would re-stage the 8.3GB int8 VLM with
        # the 5GB int8 T5 still resident (offload OOM hazard + a pointless
        # host->HBM transfer per true-CFG edit)
        images, embeds, txt_pad_mask = self._prep_edit_prefill(
            instruction, image
        )
        neg_prefill = None
        if true_cfg_scale > 1.0:
            neg_prefill = self._neg_cond_prefill(negative_prompt)
            if self.offload:
                from gpt_image_edit_tpu.utils.offload import sync as _sync

                _sync(neg_prefill[0])
        self._offload_text_boundary(embeds)
        prep = self._prep_edit_text(
            instruction, images, embeds, txt_pad_mask,
            height=height, width=width, seed=seed,
        )
        neg_embeds = neg_pooled = neg_txt_pad_mask = None
        if neg_prefill is not None:
            neg_embeds, neg_pooled, neg_txt_pad_mask = self._neg_cond_text(
                negative_prompt, neg_prefill[0], neg_prefill[1]
            )
        conds = prep["conds"]
        cond = None if not conds else (conds if len(conds) > 1 else conds[0])
        height, width, sample_rng = prep["height"], prep["width"], prep["rng"]
        self._evict_vlm()  # offload: VLM HBM copy freed before the scan
        out = self.pipe(
            prompt_embeds=prep["embeds"].astype(jnp.bfloat16),
            pooled_prompt_embeds=prep["pooled"].astype(jnp.bfloat16),
            image=cond,
            height=height,
            width=width,
            num_inference_steps=steps,
            guidance_scale=guidance,
            true_cfg_scale=true_cfg_scale,
            negative_prompt_embeds=neg_embeds,
            negative_pooled_prompt_embeds=neg_pooled,
            rng=sample_rng,
            step_callback=step_callback,
            num_images_per_prompt=num_images_per_prompt,
            txt_pad_mask=prep["txt_pad_mask"],
            neg_txt_pad_mask=neg_txt_pad_mask,
        )
        arrs = postprocess_to_uint8(out)
        if num_images_per_prompt > 1:
            return [Image.fromarray(a) for a in arrs]
        return Image.fromarray(arrs[0])

    # ------------------------------------------------------------------
    def edit_batch(self, reqs: List[dict], *, txt_bucket: int = 32):
        """Coalesced multi-request sampling: ONE batched denoise scan (and one
        VAE decode) for R shape-compatible edit requests.

        Beyond the reference (which serves one request at a time off the
        Gradio thread, ref:app.py:318-325): the serve/scheduler signature
        gate guarantees batchmates agree on every static shape (output size,
        steps, CFG mode, per-ref cond buckets, images-per-prompt), so their
        conditioning can be stacked into one static-shape device program —
        text embeds are zero-padded to a shared ``txt_bucket`` multiple
        (padded rows are mask-inert in the joint attention) and per-request
        initial noise is drawn exactly as the solo path would, so a seeded
        request reproduces its solo output inside any batch.

        ``reqs``: list of edit() kwargs dicts. Returns one entry per request
        (a PIL image, or a list when num_images_per_prompt > 1), in order.
        Raises ValueError on shape-incompatible requests (callers such as
        serve.api_server fall back to serial execution).
        """
        if not reqs:
            return []
        if len(reqs) == 1:
            return [self.edit(**reqs[0])]
        if self.offload and os.environ.get("GIE_OFFLOAD_COALESCE", "") != "1":
            # measured on one 16GB v5e (serving bench 2026-08-20): the
            # coalesced B=2 1024^2 scan with the 12GB int8 FLUX resident
            # crashes the TPU worker outright (whole-program HBM pressure;
            # the kernels pass standalone), and scan-level bs=2 is 18%
            # worse per image anyway — raise so serve.api_server's
            # executor degrades this batch to serial execution instead
            raise ValueError(
                "coalesced batches are disabled under --offload "
                "(single-chip memory cycling): measured worker crash at "
                "batch 2; set GIE_OFFLOAD_COALESCE=1 to re-enable"
            )

        def _static(r):
            true_cfg = float(r.get("true_cfg_scale", 1.0))
            return (
                r.get("steps", 28),
                float(r.get("guidance", 3.5)),
                true_cfg,
                # the negative prompt only matters when the CFG branch runs
                (r.get("negative_prompt", "Generate an image.")
                 if true_cfg > 1.0 else None),
                int(r.get("num_images_per_prompt", 1)),
            )

        steps, guidance, true_cfg_scale, negative_prompt, n = _static(reqs[0])
        for r in reqs[1:]:
            if _static(r) != _static(reqs[0]):
                raise ValueError(
                    "edit_batch requires identical steps/guidance/CFG/"
                    "num_images_per_prompt across the batch"
                )
        if any(r.get("step_callback") for r in reqs):
            raise ValueError("step_callback is not supported in edit_batch")

        # pure-host shape compatibility BEFORE any VLM prefill: a rejected
        # batch must cost nothing on-device (the executor re-runs it serially)
        shapes = [
            self._resolve_shapes(
                self._as_image_list(r.get("image")),
                r.get("height"), r.get("width"),
            )
            for r in reqs
        ]
        if len({(h, w) for h, w, _ in shapes}) != 1:
            raise ValueError("edit_batch requires one output resolution")
        if len({tuple(bk) for _, _, bk in shapes}) != 1:
            raise ValueError("edit_batch requires matching reference buckets")
        height, width = shapes[0][0], shapes[0][1]

        # prefill pass: EVERY VLM forward (positives + the shared negative)
        # runs while the VLM is staged ONCE; then one text boundary (sync +
        # evict the VLM) and the T5/CLIP pass with T5 staged once. The old
        # per-request _prep_edit loop re-staged the int8 VLM with T5 still
        # resident and OOM'd one 16GB chip (max_batch=2 serving bench).
        prefills = [
            self._prep_edit_prefill(r["instruction"], r.get("image"))
            for r in reqs
        ]
        neg_prefill = None
        if true_cfg_scale > 1.0:
            neg_prefill = self._neg_cond_prefill(negative_prompt)
        if neg_prefill is not None and self.offload:
            from gpt_image_edit_tpu.utils.offload import sync as _sync

            _sync(neg_prefill[0])
        self._offload_text_boundary(prefills[-1][1])

        preps = [
            self._prep_edit_text(
                r["instruction"], images, embeds, mask,
                height=r.get("height"), width=r.get("width"),
                seed=r.get("seed"),
            )
            for r, (images, embeds, mask) in zip(reqs, prefills)
        ]

        # shared text bucket: zero rows + zero pad-mask are attention-inert
        max_len = max(p["embeds"].shape[1] for p in preps)
        bucket = -(-max_len // txt_bucket) * txt_bucket

        def _pad_txt(e, m):
            pad = bucket - e.shape[1]
            if pad:
                e = jnp.pad(e, ((0, 0), (0, pad), (0, 0)))
                m = jnp.pad(m, ((0, 0), (0, pad)))
            return e, m

        down = self.vcfg.downscale
        lat_h = 2 * (height // (down * 2))
        lat_w = 2 * (width // (down * 2))

        from gpt_image_edit_tpu.ops.packing import pack_latents

        embeds_rows, mask_rows, pooled_rows, latent_rows = [], [], [], []
        for p in preps:
            e, m = _pad_txt(p["embeds"].astype(jnp.bfloat16), p["txt_pad_mask"])
            embeds_rows.append(jnp.repeat(e, n, axis=0))
            mask_rows.append(jnp.repeat(m, n, axis=0))
            pooled_rows.append(
                jnp.repeat(p["pooled"].astype(jnp.bfloat16), n, axis=0)
            )
            # per-request noise drawn exactly like the solo pipeline call:
            # (n, lat_h, lat_w, C) fp32 from this request's sample rng
            noise = jax.random.normal(
                p["rng"], (n, lat_h, lat_w, self.vcfg.latent_channels),
                dtype=jnp.float32,
            ).astype(jnp.bfloat16)
            latent_rows.append(pack_latents(noise))

        neg_embeds = neg_pooled = neg_txt_pad_mask = None
        total = len(reqs) * n
        if neg_prefill is not None:
            # one VLM prefill for the shared negative prompt (done in the
            # prefill pass above), tiled to B
            ne, np_, nm = self._neg_cond_text(
                negative_prompt, neg_prefill[0], neg_prefill[1]
            )
            neg_embeds = jnp.repeat(ne, total, axis=0)
            neg_pooled = jnp.repeat(np_, total, axis=0)
            neg_txt_pad_mask = jnp.repeat(nm, total, axis=0)

        # offload: text pass done — barrier on its outputs and drop the
        # text-encoder HBM copies (the VLM is already gone since the text
        # boundary) BEFORE the ref encodes stage the VAE (one-component
        # peak); harmless no-ops when offload is off
        if self.offload:
            from gpt_image_edit_tpu.utils.offload import sync as _sync

            _sync(embeds_rows[-1])
            if neg_embeds is not None:
                _sync(neg_embeds)
        self._evict_vlm()

        cond_rows, image_ids = [], None
        for p in preps:
            if p["conds"]:
                # encode each reference ONCE per request, tile the packed
                # latents across the n samples (row-identical to the solo
                # path, which tiles pixels and re-encodes duplicates)
                if len(p["conds"]) > 1:
                    lat, ids = self.pipe.encode_references(p["conds"])
                else:
                    lat, ids = self.pipe.encode_reference(p["conds"][0])
                image_ids = ids
                cond_rows.append(jnp.repeat(lat.astype(jnp.bfloat16), n, axis=0))
        out = self.pipe(
            prompt_embeds=jnp.concatenate(embeds_rows, axis=0),
            pooled_prompt_embeds=jnp.concatenate(pooled_rows, axis=0),
            image_latents=(
                jnp.concatenate(cond_rows, axis=0) if cond_rows else None
            ),
            image_ids=image_ids,
            height=height,
            width=width,
            num_inference_steps=steps,
            guidance_scale=guidance,
            true_cfg_scale=true_cfg_scale,
            negative_prompt_embeds=neg_embeds,
            negative_pooled_prompt_embeds=neg_pooled,
            latents=jnp.concatenate(latent_rows, axis=0),
            txt_pad_mask=jnp.concatenate(mask_rows, axis=0),
            neg_txt_pad_mask=neg_txt_pad_mask,
        )
        arrs = postprocess_to_uint8(out)
        results = []
        for i in range(len(reqs)):
            group = [Image.fromarray(a) for a in arrs[i * n : (i + 1) * n]]
            results.append(group if n > 1 else group[0])
        return results

    # ------------------------------------------------------------------
    def route(self, message: str, image: Optional[Image.Image] = None) -> bool:
        """Task-head routing: True = IMAGE branch (ref:cli.py:199-207).
        Falls back to 'image present => edit' without a head."""
        if self.task_head is None:
            return image is not None
        from gpt_image_edit_tpu.serve.task_head import route as _route

        value = ("<image>" if image is not None else "") + message
        conversation = [{"from": "user", "value": value}]
        images = [image] if image is not None else []
        kwargs, _ = self._prepare_inputs(conversation, images)
        hidden = apply_qwen(self._qwen(), self.qcfg, output_type="hidden", **kwargs)
        verdict = bool(
            _route(self.task_head, hidden, np.asarray(kwargs["input_ids"]))[0]
        )
        if self.offload:
            self._evict_vlm()  # routing read the verdict (host bool): idle
        return verdict

    _TEXT_KW = ("max_new_tokens", "do_sample", "temperature", "top_k", "top_p")

    def chat(self, message: str, image: Optional[Image.Image] = None, **kw):
        """One chat turn with automatic routing: returns (PIL image, None) or
        (None, text answer) — the reference REPL's behavior. Text-generation
        knobs (max_new_tokens/do_sample/temperature/top_k/top_p) apply only
        when the turn routes to text, mirroring how the reference's edit
        knobs are ignored by `model.generate` (ref:cli.py:256-267)."""
        text_kw = {k: kw.pop(k) for k in self._TEXT_KW if k in kw}
        if self.route(message, image):
            return self.edit(message, image, **kw), None
        return None, self.answer(message, image, seed=kw.get("seed"), **text_kw)

    # ------------------------------------------------------------------
    # multi-turn chat with history-image conditioning (ref:app.py:222-330,
    # ref:cli.py:141-254: every turn re-encodes the FULL conversation and
    # conditions generation on ALL history images, generated ones included)
    def reset_chat(self):
        self.conversation: List[dict] = []
        self.history_images = []
        self._cond_cache: dict = {}

    _COND_CACHE_MAX = 64  # per-image packed latents are ~0.5MB each

    def _encode_history_conds(self, images: List[Image.Image], buckets,
                              sync_on=None):
        """(packed (1, S, 64), ids (S, 3)) for the history conditioning set.

        Beyond the reference (which VAE-re-encodes EVERY history image on
        every turn, ref:app.py:286-303): per-image latents are cached by
        image identity + bucket, so turn K only encodes the images that are
        new since turn K-1. Bit-identical to re-encoding (the VAE encode is
        deterministic); the cache dies with reset_chat()."""
        from gpt_image_edit_tpu.ops.packing import latent_image_ids

        packed_list, ids_list = [], []
        down = self.vcfg.downscale
        cold = any(
            (id(im), im.size, bh, bw) not in self._cond_cache
            for im, (bh, bw) in zip(images, buckets)
        )
        if cold and self.offload:
            # staging the VAE while the VLM HBM copy is live would break
            # the one-component-peak contract: barrier on the prefill
            # outputs (dispatch is async on axon), then evict the VLM
            # BEFORE the first encode stages the VAE (idempotent later)
            from gpt_image_edit_tpu.utils.offload import sync as _sync

            if sync_on is not None:
                _sync(sync_on)
            self._evict_vlm()
        for k, (im, (bh, bw)) in enumerate(zip(images, buckets)):
            key = (id(im), im.size, bh, bw)
            lat = self._cond_cache.get(key)
            if lat is None:
                px = jnp.asarray(preprocess_vae_image(im, bh, bw))[None]
                lat, _ = self.pipe.encode_reference(px)
                if len(self._cond_cache) >= self._COND_CACHE_MAX:
                    self._cond_cache.pop(next(iter(self._cond_cache)))
                self._cond_cache[key] = lat
            packed_list.append(lat)
            # rope ids: the k-th reference gets modality k+1 (matches
            # pipe.encode_reference/encode_references)
            ids_list.append(
                latent_image_ids((bh // down) // 2, (bw // down) // 2,
                                 modality=k + 1)
            )
        return (
            jnp.concatenate(packed_list, axis=1),
            jnp.concatenate(ids_list, axis=0),
        )

    def chat_turn(
        self,
        message: str,
        new_images: Optional[List[Image.Image]] = None,
        *,
        force_generate: Optional[bool] = None,
        ocr_enhancer: bool = False,
        **edit_kw,
    ):
        """One stateful chat turn. Returns (PIL image | None, text | None);
        the generated image joins the history as conditioning for later
        turns (ref:cli.py:249-254 history_image_paths.append)."""
        if not hasattr(self, "conversation"):
            self.reset_chat()
        # text-generation knobs: split off BEFORE routing so an image turn
        # never forwards them to the denoise pipeline (they apply only when
        # the router picks the understanding branch)
        text_kw = {k: edit_kw.pop(k) for k in self._TEXT_KW if k in edit_kw}
        new_images = list(new_images or [])
        text = message
        if ocr_enhancer and new_images:
            # OCR phrases appended to the user text (ref:app.py:236-244)
            from gpt_image_edit_tpu.utils.ocr import ocr_phrases_for_image

            phrases = [
                p for i, img in enumerate(new_images)
                if (p := ocr_phrases_for_image(img, len(self.history_images) + i))
            ]
            if phrases:
                text = text + "\n" + "\n".join(phrases)
        self.conversation.append(
            {"from": "user", "value": text + "<image>" * len(new_images)}
        )
        self.history_images.extend(new_images)

        # route on the full conversation (ref:app.py:264-277 + overrides)
        if force_generate is None:
            if self.task_head is None:
                generate = bool(self.history_images)
            else:
                from gpt_image_edit_tpu.serve.task_head import route as _route

                kwargs, _ = self._prepare_inputs(self.conversation, self.history_images)
                hidden = apply_qwen(
                    self._qwen(), self.qcfg, output_type="hidden", **kwargs
                )
                generate = bool(
                    _route(self.task_head, hidden, np.asarray(kwargs["input_ids"]))[0]
                )
        else:
            generate = force_generate

        if generate:
            embeds, enc_kwargs = self._encode_prompt(self.conversation, self.history_images)
            txt_pad_mask = enc_kwargs["attention_mask"]
            self._offload_text_boundary(embeds)
            t5_embeds, pooled = self._text_cond(message)
            if t5_embeds is not None:
                embeds = jnp.concatenate([embeds, t5_embeds.astype(embeds.dtype)], axis=1)
                txt_pad_mask = jnp.concatenate(
                    [txt_pad_mask,
                     jnp.ones((1, t5_embeds.shape[1]), txt_pad_mask.dtype)],
                    axis=1,
                )
            height, width, buckets = self._resolve_shapes(
                self.history_images, None, None
            )
            image_latents = image_ids = None
            if self.history_images:
                image_latents, image_ids = self._encode_history_conds(
                    self.history_images, buckets, sync_on=embeds
                )
            seed = edit_kw.pop("seed", None)
            if seed is not None:
                sample_rng = jax.random.split(jax.random.key(seed))[1]
            else:
                self.rng, sample_rng = jax.random.split(self.rng)
            self._evict_vlm()  # offload: VLM HBM copy freed before the scan
            out = self.pipe(
                prompt_embeds=embeds.astype(jnp.bfloat16),
                pooled_prompt_embeds=pooled.astype(jnp.bfloat16),
                image_latents=image_latents,
                image_ids=image_ids,
                height=height, width=width,
                num_inference_steps=edit_kw.pop("steps", 28),
                guidance_scale=edit_kw.pop("guidance", 3.5),
                rng=sample_rng,
                txt_pad_mask=txt_pad_mask,
                **edit_kw,
            )
            arrs = postprocess_to_uint8(out)
            imgs = [Image.fromarray(a) for a in arrs]
            # only the FIRST sample joins the chat history (the reference
            # collages extras for display only, ref:app.py:324-329)
            self.conversation.append({"from": "assistant", "value": "<image>"})
            self.history_images.append(imgs[0])
            return (imgs if len(imgs) > 1 else imgs[0]), None

        kwargs, deltas = self._prepare_inputs(self.conversation, self.history_images)
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate

        if text_kw.get("do_sample"):
            seed = edit_kw.pop("seed", None)
            if seed is not None:
                text_kw["rng"] = jax.random.key(seed)
            else:
                self.rng, text_kw["rng"] = jax.random.split(self.rng)
        out_tokens = generate(
            self._qwen(), self.qcfg,
            rope_delta=int(deltas[0, 0]),
            max_new_tokens=text_kw.pop("max_new_tokens", 128),
            eos_token_id=getattr(self.tokenizer, "eos_token_id", C.IM_END_ID),
            **text_kw,
            **kwargs,
        )
        if self.offload:
            self._evict_vlm()  # decode done (tokens on host); idle = 0 HBM
        if hasattr(self.tokenizer, "decode"):
            answer = self.tokenizer.decode(out_tokens, skip_special_tokens=True)
        else:
            answer = " ".join(map(str, out_tokens))
        self.conversation.append({"from": "assistant", "value": answer})
        return None, answer

    # ------------------------------------------------------------------
    def load_text_encoders(self, flux_ckpt_dir: str):
        """Load T5-XXL + CLIP-L from a FLUX checkpoint dir for the
        only_use_t5 ablation / CLIP pooled embeds (ref:train_denoiser.py:408-426)."""
        from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

        self.text_encoders = FluxTextEncoders(
            flux_ckpt_dir,
            offload_store=self._store if self.offload else None,
            quantize_t5=getattr(self, "quantize_t5", None),
        )
        return self.text_encoders

    def edit_t5_only(
        self,
        instruction: str,
        image: Optional[Image.Image] = None,
        *,
        steps: int = 28,
        guidance: float = 3.5,
        max_sequence_length: int = 512,
        seed: Optional[int] = None,
    ) -> Image.Image:
        """T5-only conditioning, bypassing the VLM (the reference's
        step1_gen_samples_T5_only ablation, ref:univa/eval/imgedit/)."""
        assert getattr(self, "text_encoders", None) is not None, (
            "call load_text_encoders(flux_ckpt_dir) first"
        )
        embeds, pooled = self.text_encoders.encode_prompt(
            [instruction], max_sequence_length
        )
        height, width = update_size(image)
        if self.vcfg.downscale != 8:  # tiny demo: keep it small
            height = width = 8 * self.vcfg.downscale
        cond = None
        if image is not None:
            bw, bh = pick_kontext_resolution(image.width, image.height)
            if self.vcfg.downscale != 8:
                bw = bh = height
            cond = jnp.asarray(preprocess_vae_image(image, bh, bw))[None]
        rng = jax.random.key(seed) if seed is not None else self.rng
        self.rng, sample_rng = jax.random.split(rng)
        self._evict_vlm()  # offload: drop T5/CLIP HBM copies before the scan
        out = self.pipe(
            prompt_embeds=embeds.astype(jnp.bfloat16),
            pooled_prompt_embeds=pooled.astype(jnp.bfloat16),
            image=cond,
            height=height, width=width,
            num_inference_steps=steps, guidance_scale=guidance,
            rng=sample_rng,
        )
        return Image.fromarray(postprocess_to_uint8(out)[0])

    # ------------------------------------------------------------------
    def answer(
        self,
        question: str,
        image: Optional[Image.Image] = None,
        *,
        max_new_tokens: int = 64,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: Optional[int] = None,
    ) -> str:
        """Understanding branch: KV-cache decode (ref:cli.py:256-267).
        Greedy by default; ``do_sample`` enables the HF-parity
        temperature/top-k/top-p warpers (ops/sampling.py) — ``seed`` makes
        a sampled answer reproducible."""
        images = [image] if image is not None else []
        value = ("<image>" if image is not None else "") + question
        conversation = [{"from": "user", "value": value}]
        kwargs, deltas = self._prepare_inputs(conversation, images)

        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate

        sample_kw: dict = {}
        if do_sample:
            if seed is not None:
                rng = jax.random.key(seed)
            else:
                self.rng, rng = jax.random.split(self.rng)
            sample_kw = dict(
                do_sample=True, temperature=temperature,
                top_k=top_k, top_p=top_p, rng=rng,
            )
        out_tokens = generate(
            self._qwen(), self.qcfg,
            rope_delta=int(deltas[0, 0]),
            max_new_tokens=max_new_tokens,
            eos_token_id=getattr(self.tokenizer, "eos_token_id", C.IM_END_ID),
            **sample_kw,
            **kwargs,
        )
        if self.offload:
            # out_tokens are host ints (decode completed) -> VLM buffers
            # have no in-flight consumers; restore the idle-=-zero-HBM state
            self._evict_vlm()
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(out_tokens, skip_special_tokens=True)
        return " ".join(map(str, out_tokens))
