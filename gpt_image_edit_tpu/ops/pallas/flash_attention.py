"""Pallas TPU flash attention (forward) with segment/padding/causal masking.

Online-softmax tiling: grid (B, H, num_q_blocks, num_kv_blocks) with the KV
dimension innermost — TPU grids execute sequentially, so the running max /
sum / accumulator live in VMEM scratch across KV steps and the output tile is
written once on the final KV step. Causal upper-triangle KV blocks are
skipped entirely (predicated via @pl.when).

GQA is handled by indexing the KV head as hq // (Hq // Hkv) in the BlockSpec
index maps — no jnp.repeat materialization.

The backward pass currently routes through an XLA recompute (custom_vjp);
a Pallas backward kernel is the planned follow-up.

Replaces flash-attn-2 in the reference stack (ref:train_denoiser.py:1633).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_fwd_kernel(
    q_ref,      # (1, 1, bq, d)
    k_ref,      # (1, 1, bkv, d)
    v_ref,      # (1, 1, bkv, d)
    qseg_ref,   # (1, bq) int32
    kseg_ref,   # (1, bkv) int32
    o_ref,      # (1, 1, bq, d)
    m_scr,      # (bq, 128) fp32 running max (col-broadcast)
    l_scr,      # (bq, 128) fp32 running sum
    acc_scr,    # (bq, d) fp32 accumulator
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
):
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    nkv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Causal: skip blocks strictly above the diagonal.
    run = True
    if causal:
        run = (ikv * block_kv) <= (iq * block_q + block_q - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bkv)

        qseg = qseg_ref[0, :]
        kseg = kseg_ref[0, :]
        keep = qseg[:, None] == kseg[None, :]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + ikv * block_kv
            keep = jnp.logical_and(keep, cols <= rows)
        s = jnp.where(keep, s, _NEG_INF)

        m_prev = m_scr[:, :1]                       # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        # Guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1.
        p = jnp.exp(s - m_new)
        p = jnp.where(keep, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)             # (bq, 1)

        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ikv == nkv - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash_attention_core(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
                          interpret=False):
    return _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
                      interpret)


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
               interpret=False):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv

    # BHSD layout inside the kernel for contiguous (S, D) tiles.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    nq = pl.cdiv(sq, block_q)
    nkv = pl.cdiv(skv, block_kv)
    grid = (b, hq, nq, nkv)

    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            scale=scale,
            causal=causal,
            block_q=block_q,
            block_kv=block_kv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d),
                lambda ib, ih, iq, ikv, g=group: (ib, ih // g, ikv, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d),
                lambda ib, ih, iq, ikv, g=group: (ib, ih // g, ikv, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q),
                lambda ib, ih, iq, ikv: (ib, iq),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv),
                lambda ib, ih, iq, ikv: (ib, ikv),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
        interpret=interpret,
    )(qt, kt, vt, q_seg, kv_seg)
    return out.transpose(0, 2, 1, 3)


def _xla_reference(q, k, v, q_seg, kv_seg, causal, scale):
    from gpt_image_edit_tpu.ops.attention import dot_product_attention

    return dot_product_attention(
        q,
        k,
        v,
        causal=causal,
        q_segment_ids=q_seg,
        kv_segment_ids=kv_seg,
        scale=scale,
        impl="xla",
    )


def _core_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv, interpret=False):
    out = _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv, interpret)
    return out, (q, k, v, q_seg, kv_seg)


def _core_bwd(causal, scale, block_q, block_kv, interpret, res, g):
    q, k, v, q_seg, kv_seg = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, q_seg, kv_seg, causal, scale),
        q,
        k,
        v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,  # interpreter mode for CPU correctness tests
) -> jnp.ndarray:
    """BSHD flash attention. See ops.attention.dot_product_attention for args."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    if sq % block_q != 0 or skv % block_kv != 0:
        # Fall back for ragged shapes; bucketing should normally prevent this.
        return _xla_reference(
            q, k, v,
            q_segment_ids if q_segment_ids is not None else jnp.zeros((b, sq), jnp.int32),
            _merge_kv_seg(kv_segment_ids, pad_mask, b, skv),
            causal, scale,
        )

    if q_segment_ids is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
    else:
        q_seg = q_segment_ids.astype(jnp.int32)
    kv_seg = _merge_kv_seg(kv_segment_ids, pad_mask, b, skv)
    return _flash_attention_core(
        q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv, interpret
    )


def _merge_kv_seg(kv_segment_ids, pad_mask, b, skv):
    """Fold the padding mask into KV segment ids (-1 = never attended)."""
    if kv_segment_ids is None:
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    else:
        kv_seg = kv_segment_ids.astype(jnp.int32)
    if pad_mask is not None:
        kv_seg = jnp.where(pad_mask.astype(jnp.bool_), kv_seg, -1)
    return kv_seg
