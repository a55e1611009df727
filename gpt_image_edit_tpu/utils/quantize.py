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


INT4_GROUP = 64  # input-channel group size for int4 scales (the reference's
                 # NF4 uses blocksize-64 grouping, ref:app.py:129-140)


def quantize_kernel(kernel: jnp.ndarray, mode: str = "weight_only") -> dict:
    """(..., in, out) fp kernel -> {'q' | 'q_w8a8': int8, 'scale': fp32 (..., 1, out)}
    or, for mode="int4", {'q4': uint8 (..., in/2, out), 'scale4': fp32
    (..., in/64, 1, out)}.

    mode="weight_only": dequantized to bf16 before the matmul (memory win).
    mode="w8a8": activations are dynamically quantized per row and the matmul
    runs int8 x int8 -> int32 on the MXU (~1.3x faster end-to-end on v5e).
    mode="int4": 4-bit weight-only with per-(64-input-group, out-channel)
    scales — two weights per byte, the parity mode for the reference's NF4
    serving (12B FLUX -> ~5.9GB); dequantized to bf16 at use like
    weight_only."""
    kf = kernel.astype(jnp.float32)
    if mode == "int4":
        *lead, d_in, d_out = kf.shape
        g = INT4_GROUP
        assert d_in % g == 0, (
            f"int4 needs in_features divisible by {g}, got {d_in}"
        )
        grouped = kf.reshape(*lead, d_in // g, g, d_out)
        amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
        scale = jnp.where(amax > 0, amax / 7.0, 1.0)
        q = jnp.clip(jnp.round(grouped / scale), -7, 7).astype(jnp.int8)
        q = q.reshape(*lead, d_in, d_out)
        # pack two consecutive input rows per byte: low nibble = even row,
        # high nibble = odd row (offset-8 unsigned nibbles)
        u = (q + 8).astype(jnp.uint8)
        lo = u[..., 0::2, :]
        hi = u[..., 1::2, :]
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return {"q4": packed, "scale4": scale}
    amax = jnp.max(jnp.abs(kf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    key = "q_w8a8" if mode == "w8a8" else "q"
    return {key: q, "scale": scale}


def dequantize_kernel_int4(qk: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """{'q4', 'scale4'} -> (..., in, out) dense kernel."""
    packed = qk["q4"]
    scale = qk["scale4"]
    *lead, half_in, d_out = packed.shape
    lo = (packed & 0x0F).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    # interleave back: even rows from lo, odd rows from hi
    q = jnp.stack([lo, hi], axis=-2)            # (..., in/2, 2, out)
    q = q.reshape(*lead, 2 * half_in, d_out)
    g = INT4_GROUP
    grouped = q.reshape(*lead, (2 * half_in) // g, g, d_out).astype(jnp.float32)
    return (grouped * scale).reshape(*lead, 2 * half_in, d_out).astype(dtype)


def dequantize_kernel(qk: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    if "q4" in qk:
        return dequantize_kernel_int4(qk, dtype)
    q = qk.get("q", qk.get("q_w8a8"))
    return (q.astype(jnp.float32) * qk["scale"]).astype(dtype)


def quantize_params(
    params: Any,
    *,
    min_size: int = 1 << 20,
    path_filter: Optional[Callable[[str], bool]] = None,
    mode: str = "weight_only",
    mode_for: Optional[Callable[[str], Optional[str]]] = None,
    place=None,
) -> Any:
    """Quantize every 'kernel' leaf bigger than min_size elements. The tree
    keeps its structure; linear() transparently handles quantized kernels.

    `mode_for(path)` overrides `mode` per kernel: return "w8a8",
    "weight_only", or None (keep full precision) — the mixed-precision hook
    scripts/quant_sensitivity.py sweeps with (every quantized kernel stays
    int8 in HBM; demoted ones run bf16 activations instead of the int8
    MXU). The sweep found NO demotions necessary at the current error
    budget, so serving quantizes uniformly.

    `place` (optional jax.sharding.Sharding, e.g. pinned_host for --offload
    serving): every output leaf/subtree is device_put there as it is built,
    so the transient device-memory footprint of quantizing a host-parked
    tree stays at ~one kernel instead of the whole quantized model."""
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
            if leaf_mode == "int4" and leaf.shape[-2] % INT4_GROUP:
                # int4 grouping needs in_features % 64 == 0; odd-shaped
                # kernels (tiny configs, patch embeds) degrade to int8
                leaf_mode = "weight_only"
            qk = quantize_kernel(leaf, leaf_mode)
            out.append(jax.device_put(qk, place) if place is not None else qk)
        else:
            out.append(
                jax.device_put(leaf, place) if place is not None else leaf
            )
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
