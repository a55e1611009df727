"""Token-selection ops for autoregressive decode (greedy + HF-parity sampling).

The reference's REPL delegates decoding to HF ``model.generate``
(ref:univa/serve/cli.py:258), which applies the checkpoint
generation_config's logits warpers before sampling. ``warp_logits``
reproduces ``transformers.generation.logits_process`` semantics exactly —
TemperatureLogitsWarper -> TopKLogitsWarper -> TopPLogitsWarper, chained in
GenerationConfig order with ``filter_value=-inf`` and
``min_tokens_to_keep=1`` — and is golden-tested against transformers.

TPU-first shape: ``temperature`` / ``top_k`` / ``top_p`` are DYNAMIC
operands (traced scalars), so serving can change them per request without
recompiling the decode ``while_loop``; only ``do_sample`` (which changes
the traced op set) is static. The warp is branchless — disabled warpers
(``top_k=0``, ``top_p=1``) are no-op'd via ``jnp.where`` on the scalar —
so ONE compiled program covers every sampling configuration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_logits(scores, *, temperature=1.0, top_k=0, top_p=1.0):
    """Apply temperature / top-k / top-p warping to ``scores`` (..., V).

    Removed tokens get ``-inf`` (HF's ``filter_value``), which
    ``jax.random.categorical``'s Gumbel trick can never select.
    ``temperature`` must be > 0 (HF validates the same bound).
    """
    scores = scores.astype(jnp.float32)
    v = scores.shape[-1]
    scores = scores / jnp.asarray(temperature, jnp.float32)

    # Top-k: remove tokens strictly below the k-th largest value — ties at
    # the threshold survive, matching torch.topk's value-threshold semantics.
    top_k = jnp.asarray(top_k, jnp.int32)
    k = jnp.clip(top_k, 1, v)
    srt = jnp.sort(scores, axis=-1)  # ascending
    kth = jnp.take_along_axis(
        srt, jnp.broadcast_to(v - k, scores.shape[:-1] + (1,)), axis=-1
    )
    scores = jnp.where(
        jnp.logical_and(top_k > 0, scores < kth), -jnp.inf, scores
    )

    # Top-p on the (possibly top-k-filtered) scores — warpers CHAIN in HF,
    # so the nucleus probabilities renormalize over the top-k survivors.
    top_p = jnp.asarray(top_p, jnp.float32)
    idx = jnp.argsort(scores, axis=-1)  # ascending, stable
    ss = jnp.take_along_axis(scores, idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(ss, axis=-1), axis=-1)
    rm = cum <= (1.0 - top_p)
    rm = rm.at[..., -1].set(False)  # min_tokens_to_keep=1
    rm = jnp.logical_and(rm, top_p < 1.0)
    # scatter back to vocab order: scatter(idx, rm) == gather(rm, argsort(idx))
    remove = jnp.take_along_axis(rm, jnp.argsort(idx, axis=-1), axis=-1)
    return jnp.where(remove, -jnp.inf, scores)


def select_next_token(
    scores,
    rng=None,
    *,
    do_sample: bool = False,
    temperature=1.0,
    top_k=0,
    top_p=1.0,
):
    """(..., V) logits -> (...,) int32 token ids.

    Greedy argmax when ``do_sample`` is False (the ``rng`` and warper args
    are ignored and nothing extra is traced); otherwise warped categorical
    sampling. ``do_sample`` must be static under jit.
    """
    if not do_sample:
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    warped = warp_logits(
        scores, temperature=temperature, top_k=top_k, top_p=top_p
    )
    return jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)
