"""ONE chat-prompt preprocessing path for every inference-side consumer.

ChatML render -> <image> -> begin + N pads + end expansion -> tokenize ->
64-multiple left-pad -> M-RoPE position ids (+ optional ViT patch tensors).
The reference builds these identically through its processor
(ref:univa/serve/cli.py:185-196); here both the serving runtime
(serve/runtime.py) and the local judge (eval/qwen_judge.py) call this one
function so the fiddly protocol cannot drift between them.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def prepare_chat_inputs(
    prompter,
    tokenizer,
    cfg,                       # Qwen2p5VLConfig (or qwen2vl equivalent)
    conversation: List[dict],  # [{"from": ..., "value": ...}] with <image> tags
    images: List,              # PIL images, one per <image> tag (in order)
    *,
    vit_pixels: int,
    gen_trigger: bool = False,
) -> Tuple[dict, np.ndarray]:
    """Returns (model_kwargs, rope_deltas).

    model_kwargs: input_ids / position_ids / attention_mask (+ pixel_patches
    and vision_aux when images are present) — the kwargs of
    models.qwen2p5vl.apply / generate_greedy."""
    import jax.numpy as jnp

    from gpt_image_edit_tpu.data import constants as C
    from gpt_image_edit_tpu.data.image_processing import preprocess_vit_patches
    from gpt_image_edit_tpu.models.qwen2p5vl import vision
    from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index

    prompt = prompter(conversation, add_generation_prompt=True)
    if gen_trigger:
        prompt += C.SPECIAL_TOKENS["image_begin_token"]

    patches, grids = [], []
    for img in images:
        flat, grid = preprocess_vit_patches(
            img,
            patch_size=cfg.vision.patch_size,
            merge_size=cfg.vision.spatial_merge_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            min_pixels=vit_pixels,
            max_pixels=vit_pixels,
        )
        patches.append(flat)
        grids.append(grid)
        n = int(np.prod(grid)) // cfg.vision.merge_unit
        expansion = (
            C.SPECIAL_TOKENS["image_begin_token"]
            + C.SPECIAL_TOKENS["image_token"] * n
            + C.SPECIAL_TOKENS["image_end_token"]
        )
        prompt = prompt.replace("<image>", expansion, 1)
    assert "<image>" not in prompt, "more <image> placeholders than images"

    ids = tokenizer.encode(prompt)
    # left-pad to a 128-multiple: bounds jit recompiles across prompt
    # lengths (prefill/decode/denoise graphs key on the static length) AND
    # keeps the prefill on the Pallas flash path — Mosaic needs the kernel's
    # kv-segment lane slices at multiples of 128, so a 64-mult bucket like
    # 320 silently costs the kernel (and before the alignment guard, failed
    # the remote compile outright on-chip)
    pad_to = ((len(ids) + 127) // 128) * 128
    pad_id = getattr(tokenizer, "pad_token_id", 151643) or 151643
    input_ids = np.full((1, pad_to), pad_id, dtype=np.int64)
    attn = np.zeros((1, pad_to), dtype=np.int64)
    input_ids[0, pad_to - len(ids):] = ids
    attn[0, pad_to - len(ids):] = 1
    grid_thw = np.asarray(grids, dtype=np.int64) if grids else None
    pos, deltas = get_rope_index(
        input_ids, grid_thw, attn,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
    )
    kwargs = dict(
        input_ids=jnp.asarray(input_ids),
        position_ids=jnp.asarray(pos),
        attention_mask=jnp.asarray(attn),
    )
    if patches:
        kwargs["pixel_patches"] = jnp.asarray(np.concatenate(patches, 0))
        kwargs["vision_aux"] = vision.vision_precompute(grid_thw, cfg.vision)
    return kwargs, deltas
