"""Tokenizer access.

Real runs use the HF tokenizer shipped inside the merged checkpoint dir
(AutoTokenizer.from_pretrained(path)). Tests and `random_data` smoke mode use
FakeTokenizer — a deterministic hash tokenizer that still honors the special
vision tokens, so the full token-expansion protocol is exercised without
tokenizer downloads."""

from __future__ import annotations

import re
import zlib
from typing import List

from gpt_image_edit_tpu.data import constants as C

_SPECIAL = {
    "<|image_pad|>": C.IMAGE_TOKEN_ID,
    "<|vision_start|>": C.VISION_START_ID,
    "<|vision_end|>": C.VISION_END_ID,
    "<|im_start|>": C.IM_START_ID,
    "<|im_end|>": C.IM_END_ID,
}
_SPECIAL_RE = re.compile("(" + "|".join(re.escape(t) for t in _SPECIAL) + ")")


class FakeTokenizer:
    """Whitespace/hash tokenizer with real Qwen special-token ids."""

    vocab_size = 152064
    eos_token = "<|im_end|>"
    eos_token_id = C.IM_END_ID
    pad_token_id = 151643  # <|endoftext|>

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in _SPECIAL_RE.split(text):
            if not chunk:
                continue
            if chunk in _SPECIAL:
                ids.append(_SPECIAL[chunk])
            else:
                for tok in chunk.split(" "):
                    if tok:
                        ids.append(zlib.crc32(tok.encode()) % 150000 + 256)
        return ids

    def convert_tokens_to_ids(self, tok: str) -> int:
        return _SPECIAL.get(tok, zlib.crc32(tok.encode()) % 150000 + 256)

    def __call__(self, texts, padding=None, max_length=None, truncation=False,
                 return_tensors="np"):
        """HF-tokenizer-call shim (padding/truncation to max_length) so the
        fake tokenizer can stand in for CLIP/T5 tokenizers in synthetic
        serving mode. Ids may exceed a small encoder vocab — JAX gathers
        clamp out-of-range indices, which is fine for shape/perf rehearsal."""
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        rows = [self.encode(t) for t in texts]
        if truncation and max_length is not None:
            rows = [r[:max_length] for r in rows]
        width = max_length if padding == "max_length" and max_length else max(
            (len(r) for r in rows), default=1
        )
        ids = np.full((len(rows), width), self.pad_token_id, np.int64)
        mask = np.zeros((len(rows), width), np.int64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r[:width]
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def load_tokenizer(path_or_fake: str):
    if path_or_fake in ("fake", "", None):
        return FakeTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path_or_fake)
