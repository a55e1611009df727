"""Gemini judge backbone (ref:univa/eval/gedit/viescore/mllm_tools/gemini.py).

Same injectable protocol as eval.judge.GPTJudge / eval.qwen_judge
Qwen25VLJudge: `score(prompt, image_paths) -> str`. Images go before the
text like the reference (prompt_content = [images, text], ref :114-120);
generation config mirrors ref :74-80 (temperature 1, top_p 0.95,
max tokens 8192). Needs the host-side `google-generativeai` package +
GEMINI_API_KEY; construction fails with a clear message without them (the
generation path never depends on this module).
"""

from __future__ import annotations

import os
from typing import List, Optional


class GeminiJudge:
    def __init__(self, model: str = "gemini-1.5-pro-latest",
                 api_key: Optional[str] = None):
        try:
            import google.generativeai as genai
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "Gemini judging needs the `google-generativeai` package "
                "(host-side, not bundled); use --backbone gpt or qwen25vl "
                "instead"
            ) from e
        key = api_key or os.environ.get("GEMINI_API_KEY")
        if not key:
            raise RuntimeError(
                "Gemini judging needs GEMINI_API_KEY (or api_key=); use "
                "--backbone gpt or qwen25vl instead"
            )
        genai.configure(api_key=key)
        self._genai = genai
        self.model = genai.GenerativeModel(
            model_name=model,
            generation_config={
                "temperature": 1,
                "top_p": 0.95,
                "top_k": 64,
                "max_output_tokens": 8192,
                "response_mime_type": "text/plain",
            },
        )

    def score(self, prompt: str, image_paths: List[str]) -> str:
        files = [
            self._genai.upload_file(p, mime_type="image/png")
            for p in image_paths
        ]
        resp = self.model.generate_content(files + [prompt])
        return resp.text

    def score_multi(self, prompt: str, image_paths: List[str], *,
                    system: Optional[str] = None, n: int = 1,
                    images_first: bool = True) -> List[str]:
        full = prompt if system is None else f"{system}\n\n{prompt}"
        return [self.score(full, image_paths) for _ in range(n)]
