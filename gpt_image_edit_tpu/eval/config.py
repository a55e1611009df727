"""Shared eval config (ref:univa/eval/configuration_eval.py EvalConfig)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class EvalConfig:
    pretrained_lvlm_name_or_path: str = ""
    pretrained_denoiser_name_or_path: str = ""
    tiny: bool = False                 # random tiny weights (harness smoke)
    output_dir: str = "./eval_out"
    num_inference_steps: int = 28
    guidance_scale: float = 3.5
    height: int = 1024
    width: int = 1024
    min_pixels: int = 200704
    max_pixels: int = 200704
    seed: int = 42
    # sharding across processes (torchrun-style rank striding,
    # ref:univa/eval/imgedit/step1_gen_samples.py:261)
    rank: int = 0
    world_size: int = 1
    # serving memory/speed options (16GB single-chip eval runs need the
    # quantized modes; mirrors serve/cli flags)
    quantize: Optional[str] = None     # int8 | w8a8 | w8a8-attn | w8a8-qk8
    quantize_vlm: "bool | str" = False  # True/"int8" weight-only | "w8a8"
    vae_dtype: str = "bfloat16"
    # >1 (beyond ref): consecutive same-shape samples generate as ONE
    # batched denoise scan (runtime.edit_batch); outputs identical
    batch_size: int = 1
    # benchmark-specific paths
    data_json: Optional[str] = None    # sample list
    image_root: Optional[str] = None   # source image root
