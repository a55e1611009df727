"""Generic resumable sharded sample generator (step-1 of every benchmark).

Mirrors the shape of ref:univa/eval/imgedit/step1_gen_samples.py: rank-strided
work list (:261), skip-existing resumability (:264-266), per-sample anyres
output sizing, PNG outputs keyed by sample id. Works for imgedit / gedit /
complex-edit / omnicontext given a sample iterator."""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, Iterable, List, Optional

from PIL import Image

from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

log = logging.getLogger("gie_tpu.eval")


def generate_samples(
    cfg: EvalConfig,
    samples: List[Dict],
    *,
    runtime: Optional[UnivaRuntime] = None,
    key_fn: Callable[[Dict], str] = lambda s: s["key"],
    prompt_fn: Callable[[Dict], str] = lambda s: s["prompt"],
    image_fn: Callable[[Dict, EvalConfig], Optional[Image.Image]] = None,
) -> List[str]:
    """Generate PNGs for this rank's shard. Returns written paths."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    if runtime is None:
        runtime = UnivaRuntime(
            cfg.pretrained_lvlm_name_or_path or None,
            cfg.pretrained_denoiser_name_or_path or None,
            tiny=cfg.tiny,
            seed=cfg.seed,
            quantize=cfg.quantize,
            quantize_vlm=cfg.quantize_vlm,
            vae_dtype=cfg.vae_dtype,
        )

    shard = samples[cfg.rank :: cfg.world_size]
    written = []
    for s in shard:
        key = key_fn(s)
        out_path = os.path.join(cfg.output_dir, f"{key}.png")
        if os.path.exists(out_path):  # resumable
            continue
        image = image_fn(s, cfg) if image_fn else None
        result = runtime.edit(
            prompt_fn(s),
            image,
            steps=cfg.num_inference_steps,
            guidance=cfg.guidance_scale,
            seed=cfg.seed,
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        result.save(out_path)
        written.append(out_path)
        log.info("wrote %s", out_path)
    return written


def load_json(path: str):
    with open(path) as f:
        return json.load(f)
