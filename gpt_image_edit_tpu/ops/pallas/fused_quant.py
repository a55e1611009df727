"""Fused LayerNorm + adaLN-modulate + int8 row quantization (Pallas, TPU).

VERDICT r4 #2: the W8A8 serving step spends ~160 ms/step in exposed
elementwise fusions. The hottest pattern is the per-block prologue
``quantize_rows(modulate(layer_norm(x), shift, scale))`` — XLA schedules it
as (at least) an absmax-reduce fusion plus a separate scale/round kernel,
re-reading the bf16 modulated tensor from HBM. This kernel does the whole
chain in one VMEM pass: read x (bf16) once, write int8 + one f32 scale per
row. At the serving shape that replaces ~3 HBM round-trips of a 53 MB
tensor per quant site (5 sites x 57 blocks) with one read + a 27 MB write.

Numerics match the jnp path's dtype choreography exactly (fp32 LN
reduction -> bf16 cast -> bf16 modulate -> fp32 quant), so results differ
from ``quantize_rows(modulate(layer_norm(x), ...))`` only by reduction
order inside the fp32 mean/var/absmax (<=1 int8 LSB on ties — parity
tested). ref:univa/models/denoise_tower.py norm1/norm2 AdaLayerNormZero
(the torch reference computes the same chain unfused in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sh_ref, sc_ref, q_ref, s_ref, *, eps: float):
    xf = x_ref[0].astype(jnp.float32)                   # (rows, D)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    # match the unfused path bit-for-bit per element: layer_norm returns
    # bf16, modulate runs in bf16, quantize_rows re-promotes to fp32
    ln = ln.astype(x_ref.dtype)
    sh = sh_ref[0].astype(x_ref.dtype)                  # (1, D)
    sc = sc_ref[0].astype(x_ref.dtype)
    mod = ln * (jnp.ones((), x_ref.dtype) + sc) + sh
    mf = mod.astype(jnp.float32)
    s = jnp.max(jnp.abs(mf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q_ref[0] = jnp.clip(jnp.round(mf / s), -127, 127).astype(jnp.int8)
    # scale output is lane-padded (rows, 128) storage; all lanes carry the
    # row scale (caller slices [..., :1])
    s_ref[0] = jnp.broadcast_to(s, s_ref.shape[1:])


def ln_modulate_quant_rows(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
):
    """``quantize_rows(modulate(layer_norm(x, eps), shift, scale))`` in one
    HBM pass. x: (B, S, D); shift/scale: (B, D). Returns (qx int8 (B,S,D),
    s_x f32 (B,S,1)). Serving-only (no VJP; training uses the jnp chain).

    D must be a 128 multiple and S a block_rows multiple (serving shapes
    are; callers fall back to the jnp chain otherwise).
    """
    b, s_len, d = x.shape
    assert shift.shape == (b, d) and scale.shape == (b, d)
    block_rows = min(block_rows, s_len)
    if d % 128 or s_len % block_rows:
        raise ValueError(f"unaligned ({s_len}, {d}) for fused quant")
    nrows = s_len // block_rows

    # shift/scale carry a singleton row axis so their block's LAST TWO dims
    # (1, d) equal the array dims for any B — a 2-D (B, d) layout with block
    # (1, d) fails Mosaic's divisible-by-(8,128)-or-full rule whenever B > 1
    # (observed: batch-2 coalesced serving rejected the whole batched scan)
    shift3 = shift[:, None, :]
    scale3 = scale[:, None, :]

    qx, s_pad = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b, nrows),
        in_specs=[
            pl.BlockSpec((1, block_rows, d), lambda ib, ir: (ib, ir, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ib, ir: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ib, ir: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_rows, d), lambda ib, ir: (ib, ir, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, 128), lambda ib, ir: (ib, ir, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_len, d), jnp.int8),
            jax.ShapeDtypeStruct((b, s_len, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, shift3, scale3)
    return qx, s_pad[..., :1]
