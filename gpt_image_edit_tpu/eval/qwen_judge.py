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
        from PIL import Image

        from gpt_image_edit_tpu.data import constants as C
        from gpt_image_edit_tpu.data.chat_prep import prepare_chat_inputs
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate_greedy

        images = [Image.open(p).convert("RGB") for p in image_paths]
        # judge prompts legitimately contain literal "<image>" text (rubrics
        # quote it); neutralize before adding the real tags so the tag
        # expansion (and its placeholder-count assert) stays exact
        text = text.replace("<image>", "<image-literal>")
        tags = "<image>" * len(images)
        value = (tags + text) if images_first else (text + tags)
        conversation = []
        if system is not None:
            conversation.append({"from": "system", "value": system})
        conversation.append({"from": "user", "value": value})

        kwargs, deltas = prepare_chat_inputs(
            self.prompter, self.tokenizer, self.cfg, conversation, images,
            vit_pixels=self.vit_pixels,
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
