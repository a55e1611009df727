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


def load_tokenizer(path_or_fake: str):
    if path_or_fake in ("fake", "", None):
        return FakeTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path_or_fake)
