"""Functional param-pytree building blocks shared by all models.

Every model in this framework is a pair of pure functions:
  init(rng, cfg) -> params (nested dict of jnp arrays)
  apply(params, cfg, *inputs) -> outputs

Weights use the (in_features, out_features) layout so forward matmuls are
`x @ w` — the natural MXU orientation — and the checkpoint translator
transposes torch's (out, in) once at load time.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear_init(
    rng: jax.Array,
    in_features: int,
    out_features: int,
    *,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
    scale: Optional[float] = None,
) -> Params:
    if scale is None:
        scale = in_features ** -0.5  # LeCun-style, matches torch default magnitude
    w = jax.random.uniform(
        rng, (in_features, out_features), dtype=jnp.float32, minval=-scale, maxval=scale
    ).astype(dtype)
    p: Params = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((out_features,), dtype=dtype)
    return p


def quantize_rows(x: jnp.ndarray):
    """Dynamic per-row int8 activation quantization: (qx int8, scale f32)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    qx = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    return qx, s_x


def _w8a8_matmul(kernel: Params, qx, s_x, out_dtype) -> jnp.ndarray:
    """int8 MXU matmul + dequant epilogue (no bias).

    The dequant epilogue runs in bf16 (int32 acc -> bf16, then the two
    broadcast scale muls): measured ~4% faster full-model step than the
    f32 epilogue, which XLA materialized as a 427MB f32 intermediate
    per 12288-wide matmul; added rounding error is ~2^-9 per element,
    well under the int8 quantization error itself.
    """
    acc = jax.lax.dot_general(
        qx, kernel["q_w8a8"],
        (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    import os as _os

    if _os.environ.get("GIE_W8A8_EPILOGUE", "bf16") == "f32":
        return (acc.astype(jnp.float32) * s_x * kernel["scale"][..., 0, :]).astype(out_dtype)
    return (
        acc.astype(jnp.bfloat16)
        * s_x.astype(jnp.bfloat16)
        * kernel["scale"][..., 0, :].astype(jnp.bfloat16)
    ).astype(out_dtype)


class QuantRows(NamedTuple):
    """Pre-quantized activation rows (int8 + per-row scale) standing in for
    the bf16 tensor as a `linear`/`linear_multi` input — produced by the
    fused Pallas ln+modulate+quant kernel (VERDICT r4 #2) so the modulated
    tensor never materializes in HBM. Intra-trace only (never crosses a
    jit/scan boundary)."""

    qx: jnp.ndarray      # int8 (B, S, D)
    s_x: jnp.ndarray     # f32 (B, S, 1)
    out_dtype: object    # activation dtype for the dequant epilogue

    @property
    def shape(self):
        return self.qx.shape


def _fuse_mod_quant_mode() -> str:
    """off | on | interpret (tests). Default ON: the full-depth A/B held on
    hardware (22.464s fused vs 22.801s plain W8A8 scan, -1.5%, 2026-08-19;
    parity int8 codes within 1 LSB). GIE_FUSE_MOD_QUANT=0 opts out."""
    import os

    v = os.environ.get("GIE_FUSE_MOD_QUANT", "1")
    return {"0": "off", "1": "on"}.get(v, v)


def _row_block(s_len: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of s_len <= cap, or 0 (serving buckets
    all have one: 8704 -> 512, 8832 -> 384, 8192/4096/512 -> 512)."""
    best = 0
    for blk in range(128, cap + 1, 128):
        if s_len % blk == 0:
            best = blk
    return best


def ln_modulate_quant(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                      probe: Params, *, mode: str = "env",
                      eps: float = 1e-6):
    """Block prologue ``modulate(layer_norm(x), shift, scale)`` for a W8A8
    consumer: returns QuantRows via the fused Pallas kernel when enabled and
    aligned (one HBM pass), else the bf16 modulated tensor (XLA path).
    `probe` is one of the consuming linear params (dispatch on its kernel
    format); `mode` is FluxConfig.fuse_mod_quant ("env" consults
    GIE_FUSE_MOD_QUANT at trace time — pass an explicit mode under jitted
    pipelines, whose compile cache cannot see the env)."""
    from gpt_image_edit_tpu.ops.norms import layer_norm, modulate

    k = probe["kernel"]
    if mode == "env":
        mode = _fuse_mod_quant_mode()
    if mode == "on":
        # real Mosaic kernel only on TPU; CPU/GPU take the XLA chain
        # (tests opt into the interpreter explicitly via "interpret")
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            mode = "off"
    if (isinstance(k, dict) and "q_w8a8" in k and mode != "off"
            and x.ndim == 3 and x.shape[-1] % 128 == 0):
        blk = _row_block(x.shape[1])
        if blk:
            from gpt_image_edit_tpu.ops.pallas.fused_quant import (
                ln_modulate_quant_rows,
            )

            qx, s_x = ln_modulate_quant_rows(
                x, shift, scale, eps=eps, block_rows=blk,
                interpret=(mode == "interpret"),
            )
            return QuantRows(qx, s_x, x.dtype)
    return modulate(layer_norm(x, eps=eps), shift, scale)


def linear(p: Params, x, *, precision=None) -> jnp.ndarray:
    kernel = p["kernel"]
    if isinstance(x, QuantRows):
        assert isinstance(kernel, dict) and "q_w8a8" in kernel, (
            "QuantRows input requires a W8A8 kernel"
        )
        y = _w8a8_matmul(kernel, x.qx, x.s_x, x.out_dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.out_dtype)
        return y
    if isinstance(kernel, dict) and "q_w8a8" in kernel:
        # W8A8: dynamic per-row activation quant, int8 MXU matmul, dequant
        qx, s_x = quantize_rows(x)
        y = _w8a8_matmul(kernel, qx, s_x, x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    if isinstance(kernel, dict):
        # weight-only quantized (int8 'q' or packed-int4 'q4'): one shared
        # dequant dispatch (utils.quantize owns the packing format)
        from gpt_image_edit_tpu.utils.quantize import dequantize_kernel

        kernel = dequantize_kernel(kernel, x.dtype)
    else:
        kernel = kernel.astype(x.dtype)
    y = jnp.dot(x, kernel, precision=precision)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def linear_multi(ps, x: jnp.ndarray):
    """Apply several linear heads to ONE activation tensor.

    For W8A8 kernels the per-row activation quantization (absmax reduce +
    round/clamp pass over x) is computed ONCE and shared — the naive
    per-head `linear` calls re-quantized the same (S, 3072) tensor for each
    of to_q/to_k/to_v/proj_mlp, 4 redundant HBM passes per block at serving
    width. Bitwise-identical to per-head `linear` (same qx, s_x).
    """
    if isinstance(x, QuantRows):
        shared, dtype = (x.qx, x.s_x), x.out_dtype
    else:
        shared, dtype = None, x.dtype
    outs = []
    for p in ps:
        kernel = p["kernel"]
        if isinstance(kernel, dict) and "q_w8a8" in kernel:
            if shared is None:
                shared = quantize_rows(x)
            y = _w8a8_matmul(kernel, *shared, dtype)
            if "bias" in p:
                y = y + p["bias"].astype(dtype)
            outs.append(y)
        else:
            assert not isinstance(x, QuantRows), (
                "QuantRows input requires all-W8A8 heads"
            )
            outs.append(linear(p, x))
    return outs


# Upper bound of |gelu(x)| over x <= 0 for the tanh approximation (the
# minimum is -0.17001 at x ~ -0.7517); rounded UP so the derived int8 scale
# never underestimates the true row absmax (no clipping, ever).
_GELU_TANH_MIN = 0.1701


def quantize_gelu_rows(pre: jnp.ndarray):
    """Per-row int8 quantization of ``gelu(pre)`` in ONE pass over gelu.

    The scale comes from the PRE-gelu row max: gelu (tanh approx) is
    monotone increasing above its dip and bounded by 0.17 in magnitude below
    it, so ``max(gelu(rowmax), 0.1701)`` >= absmax(gelu(row)) always, with
    equality whenever rowmax >= ~1.07 (every realistic 12288-wide MLP row).
    vs quantize_rows(gelu(x)) this removes a full read+write of the widest
    activation in the network (the (S, 12288) single-block MLP hidden) —
    XLA cannot fuse an absmax reduce over gelu's OUTPUT into the pass that
    computes gelu, so the naive form costs two passes.
    """
    pre_f = pre.astype(jnp.float32)
    rowmax = jnp.max(pre_f, axis=-1, keepdims=True)
    s = jnp.maximum(jax.nn.gelu(rowmax, approximate=True), _GELU_TANH_MIN) / 127.0
    g = jax.nn.gelu(pre_f, approximate=True)
    q = jnp.clip(jnp.round(g / s), -127, 127).astype(jnp.int8)
    return q, s


def linear_gelu(p: Params, pre: jnp.ndarray) -> jnp.ndarray:
    """``linear(p, gelu(pre))`` with single-pass gelu quantization when the
    kernel is W8A8 (the FLUX dual-block feed-forward second matmul)."""
    kernel = p["kernel"]
    if not (isinstance(kernel, dict) and "q_w8a8" in kernel):
        return linear(p, jax.nn.gelu(pre, approximate=True))
    qx, s_x = quantize_gelu_rows(pre)
    y = _w8a8_matmul(kernel, qx, s_x, pre.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(pre.dtype)
    return y


def adaln_stacked(p: Params, silu_temb: jnp.ndarray, chunks: int) -> jnp.ndarray:
    """All-layers adaLN modulation vectors in ONE batched matmul.

    p: STACKED per-layer linear params — kernel (L, in, C) (plain, int8
    weight-only, int4, or W8A8 dict), optional bias (L, C).
    silu_temb: (B, in) — silu(temb), shared by every layer.
    Returns (L, chunks, B, C//chunks): layer-major modulation chunks, ready
    to ride a block lax.scan as `xs`.

    Why: computed inside the scan body these are 1-row matvecs whose
    (in, C) weight slice plus six (B, C/6) result vectors get staged
    HBM<->VMEM every iteration — profiled at ~200ms of latency-bound
    `copy-start` ops per full-depth W8A8 FLUX step (~6979 copy events).
    Hoisted, the weights are read once in a streaming batched matmul and
    the scan slices one small (chunks, B, d) row per block instead.

    W8A8 path is bitwise-identical to per-layer `linear`: same row quant
    (one row, same scale), exact int32 accumulation, same bf16 epilogue
    ordering. Plain/weight-only paths may differ by XLA reduction order
    only.
    """
    kernel = p["kernel"]
    if isinstance(kernel, dict) and "q_w8a8" in kernel:
        qx, s_x = quantize_rows(silu_temb)
        acc = jax.lax.dot_general(
            qx, kernel["q_w8a8"],
            (((1,), (1,)), ((), ())),          # (B,in) x (L,in,C) -> (B,L,C)
            preferred_element_type=jnp.int32,
        )
        import os as _os

        # same epilogue dtype rule as _w8a8_matmul (ADVICE r4 #2: the
        # GIE_W8A8_EPILOGUE=f32 debug knob must cover the stacked adaLN
        # matmul too, or the per-layer-parity claim breaks under it)
        ep = (jnp.float32
              if _os.environ.get("GIE_W8A8_EPILOGUE", "bf16") == "f32"
              else jnp.bfloat16)
        y = (
            acc.astype(ep)
            * s_x.astype(ep)[:, :, None]                   # (B,1,1)
            * kernel["scale"][:, 0, :].astype(ep)[None]    # (1,L,C)
        ).astype(silu_temb.dtype)
        y = y.transpose(1, 0, 2)                           # (L, B, C)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)[:, None, :]
    elif isinstance(kernel, dict):
        # weight-only int8/int4: per-layer dequant+dot under lax.map to
        # bound the dequant transient to one layer (full-depth stacked
        # norm kernels are ~2GB bf16 if dequantized at once)
        y = jax.lax.map(lambda pl: linear(pl, silu_temb), p)  # (L, B, C)
    else:
        y = jnp.einsum(
            "bi,lic->lbc", silu_temb, kernel.astype(silu_temb.dtype)
        )
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)[:, None, :]
    L, B, C = y.shape
    d = C // chunks
    # chunk i == out[..., i*d:(i+1)*d] — matches jnp.split(axis=-1)
    return y.reshape(L, B, chunks, d).transpose(0, 2, 1, 3)


def linear_concat(p: Params, parts) -> jnp.ndarray:
    """`concat(parts, -1) @ kernel` with the matmul SPLIT per part when the
    kernel is W8A8.

    A concat-spanning absmax row reduce cannot fuse into either producer's
    epilogue, which made XLA materialize the 12288-wide gelu activation of
    the FLUX single blocks twice (426MB extra HBM traffic per block).
    Splitting gives each part its own dynamic activation scale (strictly
    better precision) and partial int32 matmuls that dequant-sum in the
    epilogue; same MAC count.

    A part may be the tuple ``("gelu", pre)``: the part value is
    ``gelu(pre)``, quantized via quantize_gelu_rows (single-pass scale from
    the pre-gelu row max) in W8A8 mode.
    """
    kernel = p["kernel"]
    if not (isinstance(kernel, dict) and "q_w8a8" in kernel):
        parts = [
            jax.nn.gelu(x[1], approximate=True) if isinstance(x, tuple) else x
            for x in parts
        ]
        return linear(p, jnp.concatenate(parts, axis=-1))
    off = 0
    y = None
    for x in parts:
        if isinstance(x, tuple):
            _, pre = x
            qx, s_x = quantize_gelu_rows(pre)
            x = pre
        else:
            qx, s_x = quantize_rows(x)
        w = {
            "q_w8a8": kernel["q_w8a8"][off:off + x.shape[-1]],
            "scale": kernel["scale"],
        }
        part = _w8a8_matmul(w, qx, s_x, x.dtype)
        y = part if y is None else y + part
        off += x.shape[-1]
    assert off == kernel["q_w8a8"].shape[0], (off, kernel["q_w8a8"].shape)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d_init(
    rng: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: int,
    *,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    fan_in = in_ch * kernel * kernel
    scale = fan_in ** -0.5
    w = jax.random.uniform(
        rng, (kernel, kernel, in_ch, out_ch), dtype=jnp.float32, minval=-scale, maxval=scale
    ).astype(dtype)
    p: Params = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype=dtype)
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """NHWC conv. padding: 'SAME', 'VALID', or explicit [(lo,hi),(lo,hi)]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(
    p: Params, x: jnp.ndarray, *, num_groups: int = 32, eps: float = 1e-6
) -> jnp.ndarray:
    """GroupNorm over NHWC, fp32 statistics."""
    dtype = x.dtype
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(dtype)


def group_norm_init(c: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def rms_weight_init(c: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype)}


def layer_norm_init(c: int, dtype=jnp.float32, bias: bool = True) -> Params:
    p = {"scale": jnp.ones((c,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((c,), dtype)
    return p


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def cast_floating(params: Params, dtype) -> Params:
    """Cast floating-point leaves to dtype, leave ints alone."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, params)
