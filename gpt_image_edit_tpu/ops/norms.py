"""Normalization primitives (fp32 accumulation, dtype-preserving).

XLA fuses these elementwise chains into neighbouring matmuls, so these are
plain jnp implementations; the win on TPU is keeping the reductions in fp32
while activations stay bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray | None = None, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm: x / rms(x) * weight. Reduction in fp32, output in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm with optional affine. Reduction in fp32, output in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation: x * (1 + scale) + shift; shift/scale are (B, D) vs x (B, S, D)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
