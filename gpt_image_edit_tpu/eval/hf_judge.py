"""Generic HF vision2seq judge backbone.

Covers the reference's remaining mllm_tools wrappers — idefics2, mantis,
minicpmv (ref:univa/eval/gedit/viescore/mllm_tools/{idefics2_eval,
mantis_idefics2_eval,minicpmv_eval}.py) — with one class: they are all
"AutoProcessor.apply_chat_template -> AutoModelForVision2Seq.generate
(greedy, max_new_tokens=512) -> batch_decode" wrappers differing only in
checkpoint path. Runs on the host's torch (CPU in this image); the
TPU-native local judge is eval.qwen_judge.Qwen25VLJudge — prefer it. Same
injectable protocol: `score(prompt, image_paths) -> str`.
"""

from __future__ import annotations

from typing import List, Optional


class HFVision2SeqJudge:
    def __init__(self, model_path: str = "HuggingFaceM4/idefics2-8b",
                 max_new_tokens: int = 512):
        import torch
        from transformers import AutoModelForVision2Seq, AutoProcessor

        self.model = AutoModelForVision2Seq.from_pretrained(
            model_path, torch_dtype=torch.float32
        ).eval()
        self.processor = AutoProcessor.from_pretrained(model_path)
        self.max_new_tokens = max_new_tokens

    def score(self, prompt: str, image_paths: List[str]) -> str:
        import torch
        from PIL import Image

        images = [Image.open(p).convert("RGB") for p in image_paths]
        messages = [{
            "role": "user",
            "content": [{"type": "image"}] * len(images)
            + [{"type": "text", "text": prompt}],
        }]
        text = self.processor.apply_chat_template(
            messages, add_generation_prompt=True
        )
        inputs = self.processor(
            text=text, images=images or None, return_tensors="pt"
        )
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens, num_beams=1
            )
        return self.processor.batch_decode(
            out[:, inputs["input_ids"].shape[1]:], skip_special_tokens=True,
            clean_up_tokenization_spaces=False,
        )[0]

    def score_multi(self, prompt: str, image_paths: List[str], *,
                    system: Optional[str] = None, n: int = 1,
                    images_first: bool = True) -> List[str]:
        full = prompt if system is None else f"{system}\n\n{prompt}"
        answer = self.score(full, image_paths)
        return [answer] * n  # greedy decode => identical samples
