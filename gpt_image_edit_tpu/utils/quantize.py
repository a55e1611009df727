"""Weight-only int8 quantization (the reference's NF4 serving option,
ref:app.py:129-176, done the TPU way).

Per-output-channel symmetric int8: kernel (in, out) -> {q: int8 (in, out),
scale: fp32 (out,)}. models.common.linear dequantizes at use — under the
stacked-layer lax.scan only ONE block's weights are ever dequantized at a
time, so the full-depth 12B FLUX fits a single 16GB v5e chip
(11.8GB int8 + ~0.7GB transient bf16 block).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray, mode: str = "weight_only") -> dict:
    """(..., in, out) fp kernel -> {'q' | 'q_w8a8': int8, 'scale': fp32 (..., 1, out)}.

    mode="weight_only": dequantized to bf16 before the matmul (memory win).
    mode="w8a8": activations are dynamically quantized per row and the matmul
    runs int8 x int8 -> int32 on the MXU (~1.3x faster end-to-end on v5e)."""
    kf = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    key = "q_w8a8" if mode == "w8a8" else "q"
    return {key: q, "scale": scale}


def dequantize_kernel(qk: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = qk.get("q", qk.get("q_w8a8"))
    return (q.astype(jnp.float32) * qk["scale"]).astype(dtype)


def quantize_params(
    params: Any,
    *,
    min_size: int = 1 << 20,
    path_filter: Optional[Callable[[str], bool]] = None,
    mode: str = "weight_only",
    mode_for: Optional[Callable[[str], Optional[str]]] = None,
) -> Any:
    """Quantize every 'kernel' leaf bigger than min_size elements. The tree
    keeps its structure; linear() transparently handles quantized kernels.

    `mode_for(path)` overrides `mode` per kernel: return "w8a8",
    "weight_only", or None (keep full precision) — the mixed-precision hook
    scripts/quant_sensitivity.py sweeps with (every quantized kernel stays
    int8 in HBM; demoted ones run bf16 activations instead of the int8
    MXU). The sweep found NO demotions necessary at the current error
    budget, so serving quantizes uniformly."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaf_mode = mode
        if mode_for is not None:
            leaf_mode = mode_for(path)
        if (
            leaf_mode is not None
            and path.endswith("kernel")
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and (path_filter is None or path_filter(path))
        ):
            out.append(quantize_kernel(leaf, leaf_mode))
        else:
            out.append(leaf)
    # rebuild manually from key paths (a quantized leaf becomes a subtree)
    by_path = {}
    for (kp, leaf), o in zip(flat, out):
        path = tuple(getattr(k, "key", getattr(k, "idx", k)) for k in kp)
        by_path[path] = o

    def _build(node, prefix=()):
        if node is None:  # pruned leaf (partitioned trainable/frozen trees)
            return None
        if isinstance(node, dict):
            return {k: _build(v, prefix + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [_build(v, prefix + (i,)) for i, v in enumerate(node)]
        return by_path[prefix]

    return _build(params)


def params_nbytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )
