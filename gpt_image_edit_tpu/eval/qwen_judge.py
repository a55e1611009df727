"""Local Qwen2.5-VL judge backbone for the benchmark judges.

The reference's GEdit VIEScore judge runs on gpt4o *or* a local Qwen2.5-VL
(ref:univa/eval/gedit/step2_gedit_bench.py:61-77,
ref:univa/eval/gedit/viescore/mllm_tools/qwen25vl_eval.py:42-110: images
then text in one user turn, greedy decode, max_new_tokens=512). On TPU
hosts with no OpenAI egress this is the only way to score GEdit-Bench, so
the local backbone runs on this repo's own qwen2p5vl model (greedy decode
is HF-parity tested, tests/test_qwen_golden.py).

Drop-in for the injectable judge protocol used by eval.viescore.VIEScore
and the step2 drivers: `score(prompt, image_paths) -> str` /
`score_multi(...) -> List[str]` (same surface as eval.judge.GPTJudge).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class Qwen25VLJudge:
    """Judge client over a plain Qwen2.5-VL(-Instruct) checkpoint.

    Greedy decode (the reference judge sets do_sample=False, ref:
    qwen25vl_eval.py:96-101), so `n`-sample calls return the single greedy
    answer replicated — fine for VIEScore (n=1 per call); complex-edit's
    n-of-m sampling needs a sampling backbone (GPTJudge) to be meaningful.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        *,
        tiny: bool = False,
        max_new_tokens: int = 512,
        vit_pixels: int = 200704,  # 448^2 ViT budget (ref judge default view)
    ):
        import jax

        from gpt_image_edit_tpu.data.prompter import Qwen2VLPrompter
        from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
        from gpt_image_edit_tpu.models.qwen2p5vl import Qwen2p5VLConfig, init_qwen

        self.prompter = Qwen2VLPrompter()
        self.max_new_tokens = max_new_tokens

        if tiny or model_path is None:
            self.cfg = Qwen2p5VLConfig.tiny()
            self.params = init_qwen(jax.random.key(0), self.cfg)
            self.tokenizer = load_tokenizer("fake")
            self.vit_pixels = 3136
        else:
            from gpt_image_edit_tpu.utils.ckpt_convert import (
                TensorSource,
                convert_qwen,
            )

            self.cfg = Qwen2p5VLConfig()
            self.params = convert_qwen(TensorSource.from_dir(model_path), self.cfg)
            self.tokenizer = load_tokenizer(model_path)
            self.vit_pixels = vit_pixels

    # -- the injectable-backbone protocol --------------------------------
    def score(self, prompt: str, image_paths: List[str]) -> str:
        return self.score_multi(prompt, image_paths)[0]

    def score_multi(
        self,
        prompt: str,
        image_paths: List[str],
        *,
        system: Optional[str] = None,
        n: int = 1,
        images_first: bool = True,
    ) -> List[str]:
        # the reference judge always places images before the text in the
        # user turn (ref:qwen25vl_eval.py:66-74); images_first=False kept
        # for protocol compatibility with GPTJudge callers
        answer = self._generate(prompt, image_paths, system=system,
                                images_first=images_first)
        return [answer] * n

    # --------------------------------------------------------------------
    def _generate(
        self,
        text: str,
        image_paths: List[str],
        *,
        system: Optional[str] = None,
        images_first: bool = True,
    ) -> str:
        import jax.numpy as jnp
        from PIL import Image

        from gpt_image_edit_tpu.data import constants as C
        from gpt_image_edit_tpu.data.image_processing import preprocess_vit_patches
        from gpt_image_edit_tpu.models.qwen2p5vl import vision
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate_greedy
        from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index

        images = [Image.open(p).convert("RGB") for p in image_paths]
        tags = "<image>" * len(images)
        value = (tags + text) if images_first else (text + tags)
        conversation = []
        if system is not None:
            conversation.append({"from": "system", "value": system})
        conversation.append({"from": "user", "value": value})
        prompt = self.prompter(conversation, add_generation_prompt=True)

        patches, grids = [], []
        for img in images:
            flat, grid = preprocess_vit_patches(
                img,
                patch_size=self.cfg.vision.patch_size,
                merge_size=self.cfg.vision.spatial_merge_size,
                temporal_patch_size=self.cfg.vision.temporal_patch_size,
                min_pixels=self.vit_pixels,
                max_pixels=self.vit_pixels,
            )
            patches.append(flat)
            grids.append(grid)
            ntok = int(np.prod(grid)) // self.cfg.vision.merge_unit
            expansion = (
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * ntok
                + C.SPECIAL_TOKENS["image_end_token"]
            )
            prompt = prompt.replace("<image>", expansion, 1)

        ids = self.tokenizer.encode(prompt)
        # left-pad to a 64-multiple: bounds jit recompiles across prompts
        pad_to = ((len(ids) + 63) // 64) * 64
        pad_id = getattr(self.tokenizer, "pad_token_id", 151643) or 151643
        input_ids = np.full((1, pad_to), pad_id, dtype=np.int64)
        attn = np.zeros((1, pad_to), dtype=np.int64)
        input_ids[0, pad_to - len(ids):] = ids
        attn[0, pad_to - len(ids):] = 1
        grid_thw = np.asarray(grids, dtype=np.int64) if grids else None
        pos, deltas = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=self.cfg.vision.spatial_merge_size,
            image_token_id=self.cfg.image_token_id,
            video_token_id=self.cfg.video_token_id,
            vision_start_token_id=self.cfg.vision_start_token_id,
        )
        kwargs = dict(
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos),
            attention_mask=jnp.asarray(attn),
        )
        if patches:
            kwargs["pixel_patches"] = jnp.asarray(np.concatenate(patches, 0))
            kwargs["vision_aux"] = vision.vision_precompute(
                grid_thw, self.cfg.vision
            )
        tokens = generate_greedy(
            self.params, self.cfg,
            rope_delta=int(deltas[0, 0]),
            max_new_tokens=self.max_new_tokens,
            eos_token_id=getattr(self.tokenizer, "eos_token_id", C.IM_END_ID)
            or C.IM_END_ID,
            **kwargs,
        )
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(tokens, skip_special_tokens=True)
        return " ".join(map(str, tokens))
