"""EMA of the trainable subtree as a sharded pytree.

Replaces the reference's DeepSpeed-ZeRO-3 EMA engine
(ref:univa/utils/create_ema.py, ref:train_denoiser.py:258-313): on TPU the
EMA copy is just another pytree with the same NamedShardings as the params —
no gather/partition choreography. Decay warmup follows the diffusers
EMAModel power schedule the reference uses."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(train_params) -> Any:
    # copy=True is REQUIRED: for fp32 params astype() would alias the train
    # buffers, which the donating train step then deletes out from under the
    # EMA tree on its first call.
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), train_params
    )


def ema_decay_for_step(
    step: jnp.ndarray,
    *,
    decay: float = 0.9999,
    use_warmup: bool = True,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    update_after_step: int = 0,
):
    """diffusers EMAModel.get_decay semantics."""
    s = jnp.maximum(step - update_after_step - 1, 0).astype(jnp.float32)
    if use_warmup:
        value = 1.0 - (1.0 + s / inv_gamma) ** -power
    else:
        value = (1.0 + s) / (10.0 + s)
    value = jnp.where(s <= 0, 0.0, value)
    return jnp.clip(value, 0.0, decay)


def ema_update(ema, train_params, decay) -> Any:
    def _upd(e, p):
        return e * decay + (1.0 - decay) * p.astype(e.dtype)

    return jax.tree_util.tree_map(_upd, ema, train_params)
