"""Step1X quote-protecting tokenization (ref:univa/dataset/qwen2vl_dataset.py:32-255,
ref:univa/serve/text_utils.py).

Text-rendering edits ('write "HELLO" on the sign') tokenize quoted literals
character-by-character so the model sees exact glyph sequences:
  "step1x" -> "s t e p 1 x". Quotes are normalized (curly -> straight), and a
failure counter auto-disables the feature after repeated errors
(ref :159-177)."""

from __future__ import annotations

import re
from typing import List, Tuple


def normalize_quotes(text: str) -> str:
    return (
        text.replace("“", '"').replace("”", '"')
        .replace("‘", "'").replace("’", "'")
    )


def extract_literal_segments(text: str) -> List[Tuple[str, bool, str]]:
    """Split into [(segment, is_literal, quote_char)] — literal segments keep
    their surrounding quotes."""
    text = normalize_quotes(text)
    segments: List[Tuple[str, bool, str]] = []
    cur = ""
    in_lit = False
    quote = None
    for ch in text:
        if ch in ('"', "'", "`") and (quote is None or ch == quote):
            if not in_lit:
                if cur:
                    segments.append((cur, False, None))
                in_lit = True
                quote = ch
                cur = ch
            else:
                cur += ch
                segments.append((cur, True, quote))
                cur = ""
                in_lit = False
                quote = None
        else:
            cur += ch
    if cur:
        segments.append((cur, in_lit, quote))
    return segments


def protect_literal(text: str, quote: str) -> str:
    """'"step1x"' -> '"s t e p 1 x"' (space-separated glyphs, quotes kept)."""
    if len(text) <= 2:
        return text
    inner = text[1:-1] if text.startswith(quote) and text.endswith(quote) else text
    out = quote
    for i, ch in enumerate(inner):
        if ch.isspace():
            out += ch
        else:
            if i > 0:
                out += " "
            out += ch
    return out + quote


def split_string(s: str) -> str:
    """Inference-time variant (ref:univa/serve/text_utils.py:split_string):
    protect every quoted literal in the prompt."""
    parts = extract_literal_segments(s)
    return "".join(
        protect_literal(seg, quote) if is_lit and quote else seg
        for seg, is_lit, quote in parts
    )


class Step1XTokenizer:
    """Wraps a tokenizer: literals are glyph-protected before encoding; image
    tokens pass through intact. Auto-disables after max_failures errors."""

    def __init__(self, tokenizer, image_token: str = "<|image_pad|>", max_failures: int = 10):
        self.tokenizer = tokenizer
        self.image_token = image_token
        self.failure_count = 0
        self.max_failures = max_failures
        self.enabled = True

    def encode(self, text: str) -> List[int]:
        if self.enabled:
            try:
                protected = split_string(text)
                # never touch special/image tokens (they contain no quotes,
                # but a pathological prompt could put quotes around them)
                if self.image_token in text:
                    assert protected.count(self.image_token) == text.count(
                        self.image_token
                    )
                return self.tokenizer.encode(protected)
            except Exception:
                self.failure_count += 1
                if self.failure_count >= self.max_failures:
                    self.enabled = False
        return self.tokenizer.encode(text)
