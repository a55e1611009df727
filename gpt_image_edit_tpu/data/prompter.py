"""ChatML prompt templating (ref:univa/utils/prompter.py Qwen2VLPrompter)."""

from __future__ import annotations

from typing import Dict, List


class Qwen2VLPrompter:
    system_role = "system"
    user_role = "user"
    assistant_role = "assistant"
    default_system = "You are a helpful assistant."

    def __call__(self, conversations: List[Dict[str, str]], add_generation_prompt: bool = True) -> str:
        out = []
        has_system = any(c["from"] == self.system_role for c in conversations)
        if not has_system:
            out.append(f"<|im_start|>system\n{self.default_system}<|im_end|>\n")
        for c in conversations:
            out.append(f"<|im_start|>{c['from']}\n{c['value']}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)

    def get_train_prompt(self, conversations: List[Dict[str, str]]):
        """Returns list of (text, is_label) spans: assistant turns are labels
        (ref:prompter.py get_train_prompt)."""
        spans = []
        has_system = any(c["from"] == self.system_role for c in conversations)
        if not has_system:
            spans.append((f"<|im_start|>system\n{self.default_system}<|im_end|>\n", False))
        for c in conversations:
            if c["from"] == self.assistant_role:
                spans.append((f"<|im_start|>{c['from']}\n", False))
                spans.append((f"{c['value']}<|im_end|>\n", True))
            else:
                spans.append((f"<|im_start|>{c['from']}\n{c['value']}<|im_end|>\n", False))
        return spans


PROMPT_TYPE = {"qwen2vl": Qwen2VLPrompter, "qwen2p5vl": Qwen2VLPrompter}
