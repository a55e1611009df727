"""Add special tokens + mean-init new embedding rows
(ref:univa/utils/embedding_resize.py smart_tokenizer_and_embedding_resize)."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def smart_embedding_resize(
    num_new_tokens: int,
    embed_tokens: jnp.ndarray,        # (V, D)
    lm_head_kernel: jnp.ndarray = None,  # (D, V) ours (in, out) layout
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append num_new_tokens rows initialized to the mean of existing
    embeddings (and columns of the lm head)."""
    if num_new_tokens <= 0:
        return embed_tokens, lm_head_kernel
    in_mean = jnp.mean(embed_tokens, axis=0, keepdims=True)
    embed_tokens = jnp.concatenate(
        [embed_tokens, jnp.tile(in_mean, (num_new_tokens, 1))], axis=0
    )
    if lm_head_kernel is not None:
        out_mean = jnp.mean(lm_head_kernel, axis=1, keepdims=True)
        lm_head_kernel = jnp.concatenate(
            [lm_head_kernel, jnp.tile(out_mean, (1, num_new_tokens))], axis=1
        )
    return embed_tokens, lm_head_kernel
