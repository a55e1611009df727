"""Pallas TPU flash attention with segment/padding/causal masking.

Two forward strategies, picked by KV footprint:

- **resident** (default, KV <= ~8MB VMEM per head): grid (B, H, num_q_blocks);
  K/V for the whole head live in VMEM and the online-softmax loop runs as a
  `fori_loop` whose (m, l, acc) carries stay in registers — no scratch
  round-trips. The KV loop is unrolled in groups (VMEM-budgeted, up to 4) so
  Mosaic overlaps the next block's QK dot (MXU) with the current block's
  softmax (VPU), and the softmax runs in base-2 with log2(e) folded into the
  QK scale (exp2 is the cheaper VPU op). 138.6 TFLOP/s effective on v5e at
  the MMDiT serving shape (8704, 24 heads, d128), 6.72 ms/call — vs 119 for
  the plain loop, ~42 for the scratch-based variant and ~16 for splash
  attention; block sweep confirms 512/512 blocks are optimal. A kv-side-
  padding-only mask lowers to an additive f32 bias row (7.52 ms/call vs 9.35
  for segment masking).
- **grid** (long sequences): KV-block dimension as the innermost grid axis
  with (m, l, acc) in VMEM scratch across steps.
- **int8** (`flash_attention_int8`, opt-in): QK^T/PV on the int8 MXU —
  measured SLOWER than bf16 on v5e (exp-bound), kept for future hardware.

Causal attention skips upper-triangle KV blocks entirely (loop bound / grid
predicate). GQA indexes the KV head as hq // group in the BlockSpec index
maps — no jnp.repeat materialization.

The backward pass is the Pallas kernel in flash_attention_bwd.py (block-
aligned resident shapes) with an XLA-recompute fallback for ragged shapes.

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
_RESIDENT_KV_BYTES = 8 * 1024 * 1024


# --------------------------------------------------------------------------
# resident-KV kernel: fori_loop over KV, carries in registers
# --------------------------------------------------------------------------

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _resident_kernel(
    q_ref,     # (1, 1, bq, d)
    k_ref,     # (1, 1, skv, d)
    v_ref,     # (1, 1, skv, d)
    qseg_ref,  # (1, 1, bq)
    kseg_ref,  # (1, 1, skv)
    o_ref,     # (1, 1, bq, d)
    lse_ref,   # (1, 1, bq, 128) fp32 logsumexp, lane-broadcast (TPU tiling)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    skv: int,
    has_segments: bool,
    need_lse: bool,
    unroll: int = 1,
    use_kv_bias: bool = False,
):
    """Online softmax in base-2: log2(e)*scale folds into the QK scale and
    exp -> exp2 (the FA2 trick; exp2 is the cheaper VPU op). The KV loop is
    manually unrolled by `unroll`: all QK dots of a group are issued in one
    basic block, so Mosaic overlaps the MXU dot of block i+1 with the VPU
    softmax of block i (measured 7.8 -> 6.7 ms at the MMDiT serving shape
    (8704, 24 heads, d128) on v5e, 140 TFLOP/s effective). The saved LSE is
    converted back to natural-log units for the backward kernels."""
    iq = pl.program_id(2)
    q = q_ref[0, 0]
    bq, d = q.shape
    nkv = skv // block_kv
    if causal:
        # last KV block this q block can see
        hi = jnp.minimum((iq * block_q + block_q + block_kv - 1) // block_kv, nkv)
    else:
        hi = nkv

    qseg = qseg_ref[0, 0, :] if has_segments else None
    scale2 = scale * _LOG2E

    # kv-bias fast path (kv-side padding only): kseg_ref holds a f32 additive
    # bias row (0 = attend, _NEG_INF = masked key) — one VPU add per element
    # instead of segment compare + two selects. Requires >=1 valid key per
    # row (true for the MMDiT joint sequence: image tokens are never padded).

    # NOTE(perf, measured): folding scale2 into q (caller- or kernel-side)
    # to skip this per-score multiply makes the Mosaic compile pathological
    # (>20 min, killed) on the current toolchain — keep the multiply.

    def qk(i):
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale2

    def absorb(i, s, carry):
        m, l, acc = carry
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :]

        if use_kv_bias:
            s = s + kseg_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]
        keep = None
        if has_segments:
            kseg = kseg_ref[0, 0, pl.ds(i * block_kv, block_kv)]
            keep = qseg[:, None] == kseg[None, :]
        if causal:
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + iq * block_q
            )
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + i * block_kv
            )
            cmask = cols <= rows
            keep = cmask if keep is None else jnp.logical_and(keep, cmask)
        if keep is not None:
            s = jnp.where(keep, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp2(s - m_new)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        alpha = jnp.exp2(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    carry = (m0, l0, a0)
    if unroll > 1:
        ngroups = hi // unroll

        def body_group(j, carry):
            i0 = j * unroll
            ss = [qk(i0 + t) for t in range(unroll)]
            for t in range(unroll):
                carry = absorb(i0 + t, ss[t], carry)
            return carry

        carry = jax.lax.fori_loop(0, ngroups, body_group, carry)
        lo_tail = ngroups * unroll
    else:
        lo_tail = 0
    carry = jax.lax.fori_loop(
        lo_tail, hi, lambda i, c: absorb(i, qk(i), c), carry
    )
    m, l, acc = carry
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    if need_lse:
        # natural-log LSE: m is in base-2 units, l is base-free
        lse_ref[0, 0] = jnp.broadcast_to(m * _LN2 + jnp.log(l), lse_ref.shape[2:])


# --------------------------------------------------------------------------
# int8 resident kernel: QK^T and PV run on the int8 MXU (2x bf16 throughput)
# --------------------------------------------------------------------------

def _resident_int8_kernel(
    q_ref,      # (1, 1, bq, d)   int8
    k_ref,      # (1, 1, skv, d)  int8
    v_ref,      # (1, 1, skv, d)  int8
    qs_ref,     # (1, 1, bq)      f32 per-row q scale
    ks_ref,     # (1, 1, skv)     f32 per-row k scale
    vs_ref,     # (1, 1, d)       f32 per-column v scale
    qseg_ref,   # (1, 1, bq)
    kseg_ref,   # (1, 1, skv)
    o_ref,      # (1, 1, bq, d)   q.dtype (v scales applied in-kernel)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    skv: int,
    has_segments: bool,
):
    """Inference-only int8 flash attention (serving fast path).

    Quantization contract (set up by flash_attention_int8):
      q = q_i8 * qs[row], k = k_i8 * ks[row], v = v_i8 * vs[col]
    Scores: (q_i8 @ k_i8^T) * qs_i * ks_j * scale — exact f32 softmax.
    Probabilities are requantized per row at this block's dynamic max, so PV
    also runs int8; the v column scales factor out of acc/l and are applied
    at the output write.
    """
    iq = pl.program_id(2)
    q = q_ref[0, 0]
    bq, d = q.shape
    nkv = skv // block_kv
    if causal:
        hi = jnp.minimum((iq * block_q + block_q + block_kv - 1) // block_kv, nkv)
    else:
        hi = nkv

    qs = qs_ref[0, 0, :][:, None]  # (bq, 1) f32
    qseg = qseg_ref[0, 0, :] if has_segments else None

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        ks = ks_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]  # (1, bkv)
        s_i32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        s = s_i32.astype(jnp.float32) * (qs * ks) * (scale * _LOG2E)

        keep = None
        if has_segments:
            kseg = kseg_ref[0, 0, pl.ds(i * block_kv, block_kv)]
            keep = qseg[:, None] == kseg[None, :]
        if causal:
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + iq * block_q
            )
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + i * block_kv
            )
            cmask = cols <= rows
            keep = cmask if keep is None else jnp.logical_and(keep, cmask)
        if keep is not None:
            s = jnp.where(keep, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp2(s - m_new)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        alpha = jnp.exp2(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        # requantize p with a per-row DYNAMIC scale (this block's row max,
        # not the global 1.0): blocks dominated by earlier maxima still get
        # full 8-bit resolution
        p_max = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-8)
        p_i8 = jnp.round(p * (127.0 / p_max)).astype(jnp.int8)
        acc = acc * alpha + jax.lax.dot_general(
            p_i8, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (p_max / 127.0)
        return m_new, l, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, hi, body, (m0, l0, a0))
    l = jnp.where(l == 0.0, 1.0, l)
    vs = vs_ref[0, 0, :][None, :]  # (1, d)
    o_ref[0, 0] = ((acc / l) * vs).astype(o_ref.dtype)


def flash_attention_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """BSHD int8 flash attention (inference serving path, no vjp).

    q/k are quantized per (batch, head, position) row; v per (batch, head,
    feature) column so its scales factor out of the normalized accumulator.
    ~1-2% relative error on worst-case gaussian q/k (flat attention); ~6% end
    -to-end budget in the tiny-FLUX W8A8 test. MEASURED SLOWER than the bf16
    kernel on v5e (the kernel is exp/VPU-bound, not MXU-bound) — shipped as
    the opt-in `--quantize w8a8-attn` experimental mode only."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    assert sq % block_q == 0 and skv % block_kv == 0, (
        "int8 path needs block-aligned shapes (bucketing guarantees this)"
    )

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def quant_rows(x):  # per (b, h, row) over d
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        xi = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        return xi, s

    q_i8, q_s = quant_rows(qt)
    k_i8, k_s = quant_rows(kt)
    vf = vt.astype(jnp.float32)
    v_s = jnp.maximum(jnp.max(jnp.abs(vf), axis=-2, keepdims=True), 1e-8) / 127.0
    v_i8 = jnp.clip(jnp.round(vf / v_s), -127, 127).astype(jnp.int8)

    if q_segment_ids is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
    else:
        q_seg = q_segment_ids.astype(jnp.int32)
    kv_seg = _merge_kv_seg(kv_segment_ids, pad_mask, b, skv)
    has_segments = not (
        q_segment_ids is None and kv_segment_ids is None and pad_mask is None
    )
    q_seg = q_seg.reshape(b, 1, sq)
    kv_seg = kv_seg.reshape(b, 1, skv)
    nq = pl.cdiv(sq, block_q)
    group = hq // hkv

    o = pl.pallas_call(
        functools.partial(
            _resident_int8_kernel,
            scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
            skv=skv, has_segments=has_segments,
        ),
        grid=(b, hq, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda ib, ih, iq, hq_=hq: (ib * hq_ + ih, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv),
                         lambda ib, ih, iq, g=group, hkv_=hkv: (ib * hkv_ + ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d),
                         lambda ib, ih, iq, g=group, hkv_=hkv: (ib * hkv_ + ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda ib, ih, iq: (ib, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv), lambda ib, ih, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(q_i8.size + k_i8.size + v_i8.size),
            transcendentals=b * hq * sq * skv,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q_i8, k_i8, v_i8, q_s.reshape(b * hq, 1, sq), k_s.reshape(b * hkv, 1, skv),
      v_s.reshape(b * hkv, 1, d), q_seg, kv_seg)

    return o.transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# qk8 resident kernel: QK^T on the int8 MXU, PV stays bf16 (inference only)
# --------------------------------------------------------------------------

def _resident_qk8_kernel(
    q_ref,      # (1, 1, bq, d)   int8
    k_ref,      # (1, 1, skv, d)  int8
    v_ref,      # (1, 1, skv, d)  v.dtype (bf16)
    qs_ref,     # (1, 1, bq)      f32 per-row q scale
    ks_ref,     # (1, 1, skv)     f32 per-row k scale
    kbias_ref,  # (1, 1, skv)     f32 additive key bias (0 / -inf), optional
    o_ref,      # (1, 1, bq, d)
    *,
    scale: float,
    block_kv: int,
    skv: int,
    use_kv_bias: bool,
    unroll: int,
):
    """Half-int8 flash attention: scores on the int8 MXU (2x bf16 MXU
    throughput), exact f32 softmax, PV in bf16. Rationale: q/k are RMS-
    normalized in every attention of this framework (FLUX qk_norm, Qwen ViT),
    so per-row int8 on them is benign, while PV in int8 (the full-int8
    kernel) needs a lossy per-block requantization of p — measured ~6x the
    output error for <1ms/call extra win. Same unroll-group structure as the
    bf16 kernel (MXU dot of block i+1 overlaps the VPU softmax of block i)."""
    q = q_ref[0, 0]
    bq, d = q.shape
    nkv = skv // block_kv
    qs = qs_ref[0, 0, :][:, None]  # (bq, 1) f32
    scale2 = scale * _LOG2E

    def qk(i):
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        ks = ks_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]
        s_i32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return s_i32.astype(jnp.float32) * (qs * ks) * scale2

    def absorb(i, s, carry):
        m, l, acc = carry
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        if use_kv_bias:
            s = s + kbias_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    carry = (m0, l0, a0)
    if unroll > 1:
        ngroups = nkv // unroll

        def body_group(j, carry):
            i0 = j * unroll
            ss = [qk(i0 + t) for t in range(unroll)]
            for t in range(unroll):
                carry = absorb(i0 + t, ss[t], carry)
            return carry

        carry = jax.lax.fori_loop(0, ngroups, body_group, carry)
        lo_tail = ngroups * unroll
    else:
        lo_tail = 0
    carry = jax.lax.fori_loop(
        lo_tail, nkv, lambda i, c: absorb(i, qk(i), c), carry
    )
    m, l, acc = carry
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def flash_attention_qk8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    pad_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """BSHD flash attention with int8 QK^T and bf16 PV (inference, no vjp).

    Supports the serving masking case only: optional kv-side pad_mask
    (prompt bucketing), no segments, non-causal. Falls back to the bf16
    semantics exactly except that q/k pass through per-row int8."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    if (
        sq % block_q != 0
        or skv % block_kv != 0
        or skv * d * (1 + 2) > _RESIDENT_KV_BYTES + _RESIDENT_KV_BYTES // 2
    ):
        # Ragged / non-resident shapes: degrade to the bf16 XLA reference
        # (same semantics minus the int8 QK speedup) instead of crashing a
        # serving request that escaped the resolution buckets.
        return _xla_reference(
            q, k, v,
            jnp.zeros((b, sq), jnp.int32),
            _merge_kv_seg(None, pad_mask, b, skv),
            False, scale,
        )

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def quant_rows(x):  # per (b, h, row) over d
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        xi = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        return xi, s

    q_i8, q_s = quant_rows(qt)
    k_i8, k_s = quant_rows(kt)

    use_kv_bias = pad_mask is not None
    if use_kv_bias:
        kbias = jnp.where(
            pad_mask.astype(jnp.bool_), 0.0, _NEG_INF
        ).astype(jnp.float32).reshape(b, 1, skv)
    else:
        kbias = jnp.zeros((b, 1, skv), jnp.float32)

    nq = pl.cdiv(sq, block_q)
    group = hq // hkv
    # int8 K + bf16 V resident; per-block f32 scores + bf16 probs in flight
    kv_bytes = skv * d * (1 + vt.dtype.itemsize)
    per_block = block_q * block_kv * 6
    budget = 13 * 1024 * 1024
    unroll = max(1, min(4, (budget - kv_bytes) // max(per_block, 1)))

    o = pl.pallas_call(
        functools.partial(
            _resident_qk8_kernel,
            scale=scale, block_kv=block_kv, skv=skv,
            use_kv_bias=use_kv_bias, unroll=unroll,
        ),
        grid=(b, hq, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda ib, ih, iq, hq_=hq: (ib * hq_ + ih, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv),
                         lambda ib, ih, iq, g=group, hkv_=hkv: (ib * hkv_ + ih // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv), lambda ib, ih, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(q_i8.size + k_i8.size + vt.size * vt.dtype.itemsize),
            transcendentals=b * hq * sq * skv,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q_i8, k_i8, vt, q_s.reshape(b * hq, 1, sq), k_s.reshape(b * hkv, 1, skv),
      kbias)

    return o.transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# grid kernel: KV as innermost grid axis, carries in VMEM scratch
# --------------------------------------------------------------------------

def _grid_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    has_segments: bool,
    need_lse: bool,
):
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    nkv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run = True
    if causal:
        run = (ikv * block_kv) <= (iq * block_q + block_q - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

        keep = None
        if has_segments:
            keep = qseg_ref[0, 0, :][:, None] == kseg_ref[0, 0, :][None, :]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + ikv * block_kv
            cmask = cols <= rows
            keep = cmask if keep is None else jnp.logical_and(keep, cmask)
        if keep is not None:
            s = jnp.where(keep, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(
            alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ikv == nkv - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        if need_lse:
            lse_ref[0, 0] = jnp.broadcast_to(m_scr[:, :1] + jnp.log(l), lse_ref.shape[2:])


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
               has_segments=True, interpret=False, need_lse=True,
               use_kv_bias=False, out_vma=None):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # (b, 1, len) so segment blocks satisfy TPU tiling at any batch size
    q_seg = q_seg.reshape(b, 1, sq)
    kv_seg = kv_seg.reshape(b, 1, skv)
    nq = pl.cdiv(sq, block_q)

    resident = skv * d * 2 * k.dtype.itemsize <= _RESIDENT_KV_BYTES

    # KV-loop unroll: each in-flight block holds its f32 scores (+ bf16 probs,
    # + mask work when masking) in VMEM; budget against the 16MB scope with
    # the resident K/V. Masked paths get a lower cap (extra per-block buffers).
    kv_bytes = 2 * skv * d * k.dtype.itemsize
    heavy_mask = has_segments or causal
    per_block = block_q * block_kv * (8 if heavy_mask else 6)
    cap = 2 if heavy_mask else 4
    # the LSE residual (training fwd) keeps extra f32 state live: u4 at the
    # MMDiT serving shape measured 16.10MB (>16MB scope) with LSE vs ~15.5MB
    # without — discount the budget so that path lands on unroll=3
    budget = (10 if need_lse else 13) * 1024 * 1024
    import os as _os
    cap = int(_os.environ.get("GIE_FA_UNROLL", cap))
    unroll = max(1, min(cap, (budget - kv_bytes) // max(per_block, 1)))

    # lse is only needed as a residual for the backward kernels; at inference
    # (primal path) a dummy 8-row buffer avoids a 107MB fp32 write per call
    lse_rows = sq if need_lse else 8
    # out_vma: varying-mesh-axes annotation, required when this kernel runs
    # inside a shard_map body (the ring-attention per-hop path) — shard_map's
    # check_vma needs every pallas_call output to declare how it varies
    vma = frozenset(out_vma) if out_vma else None
    common = dict(
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype, vma=vma),
            jax.ShapeDtypeStruct((b, hq, lse_rows, 128), jnp.float32, vma=vma),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
        interpret=interpret,
    )

    if resident:
        out = pl.pallas_call(
            functools.partial(
                _resident_kernel,
                scale=scale, causal=causal, block_q=block_q,
                block_kv=block_kv, skv=skv, has_segments=has_segments,
                need_lse=need_lse, unroll=unroll, use_kv_bias=use_kv_bias,
            ),
            grid=(b, hq, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, skv, d), lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda ib, ih, iq: (ib, 0, iq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, skv), lambda ib, ih, iq: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, block_q if need_lse else 8, 128),
                    (lambda ib, ih, iq: (ib, ih, iq, 0)) if need_lse
                    else (lambda ib, ih, iq: (ib, ih, 0, 0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            **common,
        )(qt, kt, vt, q_seg, kv_seg)
        out, lse = out
    else:
        nkv = pl.cdiv(skv, block_kv)
        out = pl.pallas_call(
            functools.partial(
                _grid_kernel,
                scale=scale, causal=causal, block_q=block_q,
                block_kv=block_kv, has_segments=has_segments,
                need_lse=need_lse,
            ),
            grid=(b, hq, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_kv, d),
                             lambda ib, ih, iq, ikv, g=group: (ib, ih // g, ikv, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_kv, d),
                             lambda ib, ih, iq, ikv, g=group: (ib, ih // g, ikv, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda ib, ih, iq, ikv: (ib, 0, iq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_kv), lambda ib, ih, iq, ikv: (ib, 0, ikv),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda ib, ih, iq, ikv: (ib, ih, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, block_q if need_lse else 8, 128),
                    (lambda ib, ih, iq, ikv: (ib, ih, iq, 0)) if need_lse
                    else (lambda ib, ih, iq, ikv: (ib, ih, 0, 0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            **common,
        )(qt, kt, vt, q_seg, kv_seg)
        out, lse = out
    return out.transpose(0, 2, 1, 3), lse, resident


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_attention_core(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
                          has_segments, interpret=False, use_kv_bias=False):
    # primal (non-differentiated) path: skip the LSE residual entirely.
    # In kv-bias mode, kv_seg holds the f32 additive bias row instead.
    out, _, _ = _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
                           has_segments, interpret, need_lse=False,
                           use_kv_bias=use_kv_bias)
    return out


def _xla_reference(q, k, v, q_seg, kv_seg, causal, scale):
    from gpt_image_edit_tpu.ops.attention import dot_product_attention

    return dot_product_attention(
        q, k, v, causal=causal, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
        scale=scale, impl="xla",
    )


def _core_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
              has_segments, interpret=False, use_kv_bias=False):
    out, lse, resident = _flash_fwd(
        q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
        has_segments, interpret, need_lse=True, use_kv_bias=use_kv_bias,
    )
    return out, (q, k, v, out, lse, q_seg, kv_seg, resident)


def _core_bwd(causal, scale, block_q, block_kv, has_segments, interpret,
              use_kv_bias, res, g):
    q, k, v, o, lse, q_seg, kv_seg, resident = res
    if use_kv_bias:
        # reconstruct int segment ids from the f32 bias row for the bwd kernel
        kv_seg = jnp.where(kv_seg < -1.0, -1, 0).astype(jnp.int32)
        has_segments = True
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    if resident and sq % block_q == 0 and skv % block_kv == 0:
        from gpt_image_edit_tpu.ops.pallas.flash_attention_bwd import (
            flash_attention_bwd,
        )

        dq, dk, dv = flash_attention_bwd(
            q, k, v, o, g, lse, q_seg, kv_seg,
            causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
            has_segments=has_segments, interpret=interpret,
        )
        return dq, dk, dv, None, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, q_seg, kv_seg, causal, scale),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def _pick_block(s: int, requested: int, align: int) -> Optional[tuple[int, int]]:
    """(block, padded_len) minimizing padding: the largest `align`-multiple
    block <= requested whose padded length ceil(s/block)*block is minimal
    (ties prefer the larger block, which amortizes grid overhead). Mosaic
    needs align=128: the segment/bias rows are sliced on their LAST axis at
    i*block offsets, which must be statically provable 128-multiples
    (observed on-chip: a seq-320 VLM prefill -> block_kv=320 -> remote
    compile HTTP 500). The interpreter has no such constraint (align=1).
    Returns None when no aligned block fits (s or requested < align)."""
    best = None
    for blk in range(requested - requested % align, 0, -align):
        padded = -(-s // blk) * blk
        if best is None or padded < best[1]:
            best = (blk, padded)
            if padded == s:  # exact divisor: larger blocks were already tried
                break
    return best


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
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,  # interpreter mode for CPU correctness tests
) -> jnp.ndarray:
    """BSHD flash attention. See ops.attention.dot_product_attention for args.

    Ragged sequence lengths are handled by block-size selection + tail
    padding, NOT by an XLA fallback: serving seqs are whatever the kontext
    bucket table + prompt bucket produce (e.g. 1024^2 + ref + 640 txt tokens
    = 8832 = 23*384, and 672x1568 buckets give seqs that are not even
    128-multiples), and the reference einsum materializes a (H, S, S) f32
    score tensor -- 6.97GB at the serving shape, an on-chip compile-time
    RESOURCE_EXHAUSTED (observed in --synthetic_full serving warmup).
    Padded KV columns are masked for real rows (bias/segment/causal path);
    padded Q rows compute finite garbage and are sliced off, so their
    cotangent under the custom VJP is exactly zero."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    # interpret mode uses the SAME 128-alignment so CPU tests exercise the
    # exact block selection + padding the TPU path takes; only sub-128
    # shapes (which real Mosaic cannot block anyway) retry unaligned so
    # small interpret tests keep running the kernel
    align = 128
    pick_q = _pick_block(sq, min(block_q, sq), align)
    pick_kv = _pick_block(skv, min(block_kv, skv), align)
    if interpret and (pick_q is None or pick_kv is None):
        align = 1
        pick_q = _pick_block(sq, min(block_q, sq), align)
        pick_kv = _pick_block(skv, min(block_kv, skv), align)
    if causal and sq == skv and pick_q is not None:
        # end-aligned causal offset stays 0 only if both sides pad equally
        pick = _pick_block(sq, min(block_q, block_kv, sq), align)
        pick_q = pick_kv = pick
    pad_q = (pick_q[1] - sq) if pick_q else 0
    pad_kv = (pick_kv[1] - skv) if pick_kv else 0
    if (pick_q is None or pick_kv is None
            # padding shifts the end-aligned causal diagonal when sq != skv
            or (causal and sq != skv and (pad_q or pad_kv))
            # padded Q rows borrow segment id 0; with caller-provided Q *or*
            # KV segments that guarantee is gone (a batch row whose keys
            # contain no id-0 entries makes the padded rows' softmax empty ->
            # NaN residuals into the bwd kernel, and NaN * 0-cotangent
            # contaminates dk/dv), so keep those rare ragged shapes on XLA
            # (ADVICE r4 #1)
            or (pad_q and (q_segment_ids is not None
                           or kv_segment_ids is not None))):
        return _xla_reference(
            q, k, v,
            q_segment_ids if q_segment_ids is not None else jnp.zeros((b, sq), jnp.int32),
            _merge_kv_seg(kv_segment_ids, pad_mask, b, skv),
            causal, scale,
        )
    block_q, sq_p = pick_q
    block_kv, skv_p = pick_kv
    if pad_q or pad_kv:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_kv), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_kv), (0, 0), (0, 0)))
        if pad_kv:
            if pad_mask is None and kv_segment_ids is None and not causal:
                # synthesize the mask that marks only the KV tail as padding
                # (causal needs none: padded keys sit at indices the real
                # rows' diagonal already excludes)
                pad_mask = jnp.ones((b, skv), jnp.int32)
            if pad_mask is not None:
                pad_mask = jnp.pad(pad_mask.astype(jnp.int32),
                                   ((0, 0), (0, pad_kv)))  # 0 = masked
            if kv_segment_ids is not None:
                kv_segment_ids = jnp.pad(
                    kv_segment_ids.astype(jnp.int32),
                    ((0, 0), (0, pad_kv)), constant_values=-1,
                )
        sq, skv = sq_p, skv_p

    if q_segment_ids is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
    else:
        q_seg = q_segment_ids.astype(jnp.int32)

    # kv-side-padding-only masking (the MMDiT joint-attention case: prompt
    # bucketing pads text keys, queries are uniform) lowers to an additive
    # f32 bias row in the resident kernel — measured ~1.2 ms/call cheaper
    # than segment masking at the serving shape. Equivalent to the segment
    # path whenever every query row has >=1 valid key.
    use_kv_bias = (
        q_segment_ids is None
        and kv_segment_ids is None
        and pad_mask is not None
        and not causal
        and skv * d * 2 * k.dtype.itemsize <= _RESIDENT_KV_BYTES
    )
    if use_kv_bias:
        kv_op = jnp.where(
            pad_mask.astype(jnp.bool_), 0.0, _NEG_INF
        ).astype(jnp.float32)
        out = _flash_attention_core(
            q, k, v, q_seg, kv_op, causal, scale, block_q, block_kv,
            False, interpret, True
        )
        return out[:, :sq - pad_q] if pad_q else out

    kv_seg = _merge_kv_seg(kv_segment_ids, pad_mask, b, skv)
    has_segments = not (
        q_segment_ids is None and kv_segment_ids is None and pad_mask is None
    )
    out = _flash_attention_core(
        q, k, v, q_seg, kv_seg, causal, scale, block_q, block_kv,
        has_segments, interpret
    )
    return out[:, :sq - pad_q] if pad_q else out


def flash_attention_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    out_vma=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BSHD flash attention returning (out, lse (B, Hq, Sq) natural-log
    logsumexp). The partial-result primitive for ring/context-parallel
    attention: per-hop outputs merge exactly via
        m' = max(m, lse_t); acc' = acc*e^(m-m') + o_t*e^(lse_t-m')
    (blockwise-parallel-attention merge). Non-causal only (a per-hop global
    causal offset is not plumbed into the kernel). Differentiable (VERDICT
    r4 #5): a custom VJP routes both cotangents (do, dlse) through the
    Pallas backward kernels — d(lse)/ds = p, so dlse folds into the
    backward's delta term (see flash_attention_bwd) — which makes the ring
    flash hop usable in CP *training*, not just inference.

    Fully-masked query rows return o=0 with a finite, very negative lse
    (~-1.65e38 = _NEG_INF * ln2), so cross-hop merges stay NaN-free.
    """
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    assert sq % block_q == 0 and skv % block_kv == 0, (
        f"flash_attention_lse needs block-aligned shapes, got "
        f"sq={sq}%{block_q}, skv={skv}%{block_kv}"
    )
    # Mosaic slices the segment rows on the LANE axis at i*block offsets,
    # which must be statically provable 128-multiples; the interpreter has
    # no such constraint (CPU tests cover odd shapes there)
    assert interpret or (block_q % 128 == 0 and block_kv % 128 == 0), (
        f"flash_attention_lse on TPU needs 128-aligned blocks, got "
        f"block_q={block_q}, block_kv={block_kv}"
    )
    if q_segment_ids is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
    else:
        q_seg = q_segment_ids.astype(jnp.int32)
    kv_seg = _merge_kv_seg(kv_segment_ids, pad_mask, b, skv)
    has_segments = not (
        q_segment_ids is None and kv_segment_ids is None and pad_mask is None
    )
    vma = frozenset(out_vma) if out_vma else None  # hashable (nondiff arg)
    return _lse_core(q, k, v, q_seg, kv_seg, scale, block_q, block_kv,
                     has_segments, interpret, vma)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _lse_core(q, k, v, q_seg, kv_seg, scale, block_q, block_kv,
              has_segments, interpret, out_vma):
    out, lse, _ = _flash_fwd(
        q, k, v, q_seg, kv_seg, False, scale, block_q, block_kv,
        has_segments, interpret, need_lse=True, out_vma=out_vma,
    )
    return out, lse[..., 0]


def _lse_core_fwd(q, k, v, q_seg, kv_seg, scale, block_q, block_kv,
                  has_segments, interpret, out_vma):
    out, lse, resident = _flash_fwd(
        q, k, v, q_seg, kv_seg, False, scale, block_q, block_kv,
        has_segments, interpret, need_lse=True, out_vma=out_vma,
    )
    # lse stays in its lane-padded (B, Hq, Sq, 128) storage as the residual:
    # the backward kernels read it at that layout
    return (out, lse[..., 0]), (q, k, v, out, lse, q_seg, kv_seg, resident)


def _lse_core_bwd(scale, block_q, block_kv, has_segments, interpret, out_vma,
                  res, g):
    q, k, v, o, lse, q_seg, kv_seg, resident = res
    do, dlse = g
    sq, skv = q.shape[1], k.shape[1]
    if resident and sq % block_q == 0 and skv % block_kv == 0:
        from gpt_image_edit_tpu.ops.pallas.flash_attention_bwd import (
            flash_attention_bwd,
        )

        dq, dk, dv = flash_attention_bwd(
            q, k, v, o, do, lse, q_seg, kv_seg,
            causal=False, scale=scale, block_q=block_q, block_kv=block_kv,
            has_segments=has_segments, interpret=interpret,
            dlse=dlse, out_vma=out_vma,
        )
        return dq, dk, dv, None, None
    # non-resident / misaligned: differentiate a jnp (out, lse) reference
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _lse_jnp_reference(q_, k_, v_, q_seg, kv_seg, scale),
        q, k, v,
    )
    dq, dk, dv = vjp((do, dlse))
    return dq, dk, dv, None, None


def _lse_jnp_reference(q, k, v, q_seg, kv_seg, scale):
    """jnp (out, lse) with flash_attention_lse's exact contract — the VJP
    fallback for shapes the Pallas backward cannot take (non-resident KV)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    kk = jnp.repeat(k, g, axis=2).astype(jnp.float32)
    vv = jnp.repeat(v, g, axis=2).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kk) * scale
    keep = (q_seg[:, None, :, None] == kv_seg[:, None, None, :])
    s = jnp.where(keep, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(keep, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bhqd", p / jnp.maximum(l, 1e-30), vv)
    alive = jnp.any(keep, axis=-1)                       # (B,H,Q)
    o = jnp.where(alive[..., None], o, 0.0).transpose(0, 2, 1, 3)
    lse = m[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-38))
    lse = jnp.where(alive, lse, _NEG_INF * 0.6931471805599453)  # * ln 2
    return o.astype(q.dtype), lse


_lse_core.defvjp(_lse_core_fwd, _lse_core_bwd)


def _merge_kv_seg(kv_segment_ids, pad_mask, b, skv):
    """Fold the padding mask into KV segment ids (-1 = never attended)."""
    if kv_segment_ids is None:
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    else:
        kv_seg = kv_segment_ids.astype(jnp.int32)
    if pad_mask is not None:
        kv_seg = jnp.where(pad_mask.astype(jnp.bool_), kv_seg, -1)
    return kv_seg
