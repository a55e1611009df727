"""Synthetic full-size parameter trees for hardware perf rehearsal.

No public GPT-Image-Edit checkpoints ship in this environment; serving-path
perf work still needs full-size (7B VLM + 12B FLUX + VAE + T5/CLIP) trees on
the chip. These helpers build shape-correct trees DIRECTLY at the serving
dtypes — int8/int4 payload dicts for big kernels, bf16 float leaves —
without ever materializing the fp32/bf16 masters (a full-depth bf16 FLUX is
~24GB and cannot exist on a 16GB v5e, and quantize-after-materialize OOMs).

Used by bench.py's child phases and the api_server's --synthetic_full mode
(the TPU-native rehearsal of the reference's quantized serving,
ref:app.py:129-176). Leaves are built host-side (numpy) and device_put to
`place`, so --offload trees park straight into pinned_host without
transiting HBM (in-jit memory transfers are not supported; see
utils/offload.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _put(arr: np.ndarray, place):
    return jax.device_put(arr, place) if place is not None else jnp.asarray(arr)


def shape_params(abstract, float_dtype=None, place=None, fill=0.01):
    """Concrete constant-filled tree matching an eval_shape tree.
    float_dtype (e.g. bf16) overrides the dtype of floating leaves."""
    def build(s):
        dt = s.dtype
        if float_dtype is not None and jnp.issubdtype(dt, jnp.floating):
            dt = float_dtype
        return _put(np.full(s.shape, fill, np.dtype(dt)), place)

    return jax.tree_util.tree_map(build, abstract)


def quantized_shape_params(abstract, qkey="q", min_elems=1 << 20,
                           float_dtype=None, place=None, fill=0.01):
    """Shape-only param tree with big kernels as quantized subtrees.

    qkey "q" (int8 weight-only) | "q_w8a8" (int8 MXU) | "q4" (packed int4,
    64-group scales; kernels with in_features %64 != 0 degrade to int8 "q"
    like utils.quantize.quantize_params does). Non-kernel floats keep their
    eval_shape dtype unless float_dtype overrides (serving loads bf16; an
    fp32 tree would overstate HBM ~2x on the VLM's 1.1GB embedding table).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
    by_path = {}
    for kp, s in flat:
        path_t = tuple(getattr(k, "key", getattr(k, "idx", k)) for k in kp)
        path = "/".join(str(p) for p in path_t)
        if (path.endswith("kernel") and len(s.shape) >= 2
                and int(np.prod(s.shape)) >= min_elems):
            d_in, d_out = s.shape[-2], s.shape[-1]
            if qkey == "q4" and d_in % 64 == 0:
                by_path[path_t] = {
                    "q4": _put(np.ones(s.shape[:-2] + (d_in // 2, d_out),
                                       np.uint8), place),
                    "scale4": _put(np.full(
                        s.shape[:-2] + (d_in // 64, 1, d_out), fill,
                        np.float32), place),
                }
                continue
            k8 = "q" if qkey == "q4" else qkey
            by_path[path_t] = {
                k8: _put(np.ones(s.shape, np.int8), place),
                "scale": _put(np.full(s.shape[:-2] + (1, d_out), fill,
                                      np.float32), place),
            }
        else:
            dt = s.dtype
            if float_dtype is not None and jnp.issubdtype(dt, jnp.floating):
                dt = float_dtype
            by_path[path_t] = _put(np.full(s.shape, fill, np.dtype(dt)), place)

    def build(node, prefix=()):
        if isinstance(node, dict):
            return {k: build(v, prefix + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [build(v, prefix + (i,)) for i, v in enumerate(node)]
        return by_path[prefix]

    # abstract trees here are nested dicts/lists of ShapeDtypeStructs
    return build(abstract)
