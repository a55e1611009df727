"""Prodigy optimizer (Mishchenko & Defazio, arXiv:2306.06101) for optax.

The reference offers optimizer='prodigy' (ref:train_denoiser.py:585-624,
ref:univa/training/configuration_denoise.py TrainingConfig.optimizer); this is
the TPU-side equivalent, implemented as a pure optax GradientTransformation so
it shards/checkpoints like any other state.

Update rule (Adam-type Prodigy, matching the prodigyopt package defaults):
    m_k = β1 m + (1-β1) d g
    v_k = β2 v + (1-β2) d² g²
    r_k = √β2 r + (1-√β2) lr d² ⟨g, x0 - x⟩
    s_k = √β2 s + (1-√β2) lr d² g
    d̂  = d_coef · r / ||s||₁ ;  d = max(d, d̂)
    x  -= lr d m / (√v + d·eps)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: chex.Array
    d: chex.Array          # scalar distance estimate
    r: chex.Array          # scalar numerator accumulator
    m: optax.Updates
    v: optax.Updates
    s: optax.Updates
    x0: optax.Params       # initial params


def prodigy(
    learning_rate: float = 1.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    b1, b2 = betas
    sqrt_b2 = b2 ** 0.5

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros((), jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            r=jnp.zeros((), jnp.float32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
            s=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(lambda x: x, params),
        )

    def update_fn(grads, state, params):
        assert params is not None, "prodigy needs params"
        d = state.d
        lr = learning_rate

        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * d * g, state.m, grads
        )
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * d * d * g * g, state.v, grads
        )
        # numerator: <g, x0 - x>
        dot = jax.tree_util.tree_reduce(
            lambda acc, t: acc + t,
            jax.tree_util.tree_map(
                lambda g, x0_, x: jnp.sum(
                    g.astype(jnp.float32) * (x0_ - x).astype(jnp.float32)
                ),
                grads, state.x0, params,
            ),
            jnp.zeros((), jnp.float32),
        )
        r = sqrt_b2 * state.r + (1 - sqrt_b2) * lr * d * d * dot
        s = jax.tree_util.tree_map(
            lambda s_, g: sqrt_b2 * s_ + (1 - sqrt_b2) * lr * d * d * g,
            state.s, grads,
        )
        s_l1 = jax.tree_util.tree_reduce(
            lambda acc, t: acc + t,
            jax.tree_util.tree_map(
                lambda s_: jnp.sum(jnp.abs(s_.astype(jnp.float32))), s
            ),
            jnp.zeros((), jnp.float32),
        )
        d_hat = jnp.where(s_l1 > 0, d_coef * r / jnp.maximum(s_l1, 1e-30), d)
        d_new = jnp.maximum(d, d_hat)

        def _upd(m_, v_, p):
            denom = jnp.sqrt(v_.astype(jnp.float32)) + d_new * eps
            u = -lr * d_new * m_.astype(jnp.float32) / denom
            if weight_decay > 0:
                u = u - lr * d_new * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype)

        updates = jax.tree_util.tree_map(_upd, m, v, params)
        return updates, ProdigyState(
            step=state.step + 1, d=d_new, r=r, m=m, v=v, s=s, x0=state.x0
        )

    return optax.GradientTransformation(init_fn, update_fn)
