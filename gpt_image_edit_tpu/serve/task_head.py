"""Generate-vs-understand routing head (ref:univa/serve/cli.py:42-49,199-207).

A 2-layer MLP (Linear 3584 -> 10240, SiLU, Dropout, Linear -> 2;
ref:cli.py:42-47) over the LVLM hidden state at the last `assistant` token
(id 77091); argmax 1 = generate an image, 0 = answer in text. Loads the
reference's `task_head_final.pt` torch checkpoint (keys 0.* / 3.*)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.data.constants import ASSISTANT_TOKEN_ID
from gpt_image_edit_tpu.models.common import Params, linear, linear_init


def init_task_head(rng: jax.Array, in_dim: int = 3584, hidden: int = 10240) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": linear_init(k1, in_dim, hidden),
        "fc2": linear_init(k2, hidden, 2),
    }


def load_task_head(path: str) -> Params:
    """Load the reference's task_head_final.pt (torch state dict with
    0.weight/0.bias/2.weight/2.bias or fc naming)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def get(*stems):
        for stem in stems:
            if f"{stem}.weight" in sd:
                return stem
        raise KeyError(f"task head keys {stems} not in {list(sd)[:6]}")

    k1 = get("0")
    k2 = get("3", "2")  # Dropout at index 2 pushes the second Linear to 3
    return {
        "fc1": {
            "kernel": jnp.asarray(sd[f"{k1}.weight"].float().numpy().T),
            "bias": jnp.asarray(sd[f"{k1}.bias"].float().numpy()),
        },
        "fc2": {
            "kernel": jnp.asarray(sd[f"{k2}.weight"].float().numpy().T),
            "bias": jnp.asarray(sd[f"{k2}.bias"].float().numpy()),
        },
    }


def route(
    head: Params,
    hidden_states: jnp.ndarray,  # (B, S, D) LVLM final hidden
    input_ids: np.ndarray,       # (B, S)
    assistant_token_id: int = ASSISTANT_TOKEN_ID,
) -> np.ndarray:
    """Returns (B,) bool — True = IMAGE branch (generate)."""
    ids = np.asarray(input_ids)
    pos = np.zeros(ids.shape[0], dtype=np.int64)
    for i in range(ids.shape[0]):
        hits = np.where(ids[i] == assistant_token_id)[0]
        pos[i] = hits[-1] if len(hits) else ids.shape[1] - 1
    feats = hidden_states[jnp.arange(ids.shape[0]), jnp.asarray(pos)]
    logits = linear(head["fc2"], jax.nn.silu(linear(head["fc1"], feats)))
    return np.asarray(jnp.argmax(logits, axis=-1) == 1)
