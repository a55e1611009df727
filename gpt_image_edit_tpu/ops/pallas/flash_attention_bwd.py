"""Pallas flash-attention backward kernels (dq and dk/dv).

Standard FlashAttention-2 backward with the same resident-KV layout as the
forward: the fwd saves the per-row LSE; bwd recomputes p = exp(s - lse)
blockwise, so the S x S score matrix never materializes (the XLA-recompute
fallback would need 24 x 8704^2 fp32 = 7.3GB at the MMDiT's 1024^2 shape —
this kernel is what makes stage-2 training fit).

  delta = rowsum(do * o)                      (computed in jnp)
  dv += p^T do
  ds  = p * (do v^T - delta)
  dk += ds^T q * scale ;  dq += ds k * scale

GQA: dk/dv are produced per q-head and group-summed outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = 1.4426950408889634


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dq_ref,
    *, scale, causal, block_q, block_kv, skv, has_segments,
):
    iq = pl.program_id(2)
    q = q_ref[0, 0]                      # (bq, d)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, :, :1]           # (bq, 1) — lane-padded storage
    delta = delta_ref[0, 0, :, :1]
    bq, d = q.shape
    nkv = skv // block_kv
    hi = (
        jnp.minimum((iq * block_q + block_q + block_kv - 1) // block_kv, nkv)
        if causal else nkv
    )
    qseg = qseg_ref[0, 0, :] if has_segments else None

    lse2 = lse * _LOG2E  # base-2 units (matches the exp2-folded QK scale)

    def body(i, dq):
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        p = jnp.exp2(s - lse2)
        keep = None
        if has_segments:
            kseg = kseg_ref[0, 0, pl.ds(i * block_kv, block_kv)]
            keep = qseg[:, None] == kseg[None, :]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + i * block_kv
            cmask = cols <= rows
            keep = cmask if keep is None else jnp.logical_and(keep, cmask)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, block_q, block_kv, has_segments,
):
    """Grid (B, H, nkv, nq) — q innermost; dk/dv accumulate in VMEM scratch
    so only one q/do/lse/delta block is resident at a time (the full-Q
    resident variant exceeded the 16MB VMEM scope at the MMDiT shape)."""
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        # q block contributes iff it can see any key in this kv block
        run = (iq * block_q + block_q - 1) >= (ikv * block_kv)

    @pl.when(run)
    def _step():
        k = k_ref[0, 0]                  # (bkv, d)
        v = v_ref[0, 0]
        q = q_ref[0, 0]                  # (bq, d)
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        p = jnp.exp2(s - lse * _LOG2E)   # (bq, bkv), base-2 folded
        keep = None
        if has_segments:
            qseg = qseg_ref[0, 0, :]
            kseg = kseg_ref[0, 0, :]
            keep = qseg[:, None] == kseg[None, :]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + ikv * block_kv
            cmask = cols <= rows
            keep = cmask if keep is None else jnp.logical_and(keep, cmask)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)            # (bq, bkv)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def flash_attention_bwd(
    q, k, v, o, do, lse, q_seg, kv_seg,
    *, causal, scale, block_q, block_kv, has_segments, interpret=False,
    dlse=None, out_vma=None,
):
    """BSHD grads. lse: (B, Hq, Sq) fp32 from the forward. Returns dq, dk, dv
    (dk/dv group-summed for GQA).

    dlse: optional (B, Hq, Sq) cotangent of the forward's logsumexp output
    (the ring-attention per-hop merge consumes lse, so its VJP carries one).
    Since d(lse)/d(s_k) = p_k, the lse path adds p * dlse to ds — exactly a
    -dlse shift of delta in ds = p * (dp - delta), so the kernels need no
    change. out_vma: varying-mesh-axes annotation for the grad outputs when
    this runs inside a shard_map body (the ring hop's backward)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # (B, Hq, Sq)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
    vma = frozenset(out_vma) if out_vma else None
    q_seg = q_seg.reshape(b, 1, sq)
    kv_seg = kv_seg.reshape(b, 1, skv)

    nq = sq // block_q
    nkv = skv // block_kv

    kv_spec = lambda g=group: pl.BlockSpec(
        (1, 1, skv, d), lambda ib, ih, i, g=g: (ib, ih // g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, causal=causal, block_q=block_q,
            block_kv=block_kv, skv=skv, has_segments=has_segments,
        ),
        grid=(b, hq, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            kv_spec(),
            kv_spec(),
            pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda ib, ih, iq: (ib, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv), lambda ib, ih, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype, vma=vma),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(qt, kt, vt, dot, lse, delta, q_seg, kv_seg)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, causal=causal, block_q=block_q,
            block_kv=block_kv, has_segments=has_segments,
        ),
        grid=(b, hq, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda ib, ih, ikv, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d),
                         lambda ib, ih, ikv, iq, g=group: (ib, ih // g, ikv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d),
                         lambda ib, ih, ikv, iq, g=group: (ib, ih // g, ikv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d),
                         lambda ib, ih, ikv, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda ib, ih, ikv, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda ib, ih, ikv, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda ib, ih, ikv, iq: (ib, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), lambda ib, ih, ikv, iq: (ib, 0, ikv),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d),
                         lambda ib, ih, ikv, iq: (ib, ih, ikv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d),
                         lambda ib, ih, ikv, iq: (ib, ih, ikv, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, skv, d), q.dtype, vma=vma),
            jax.ShapeDtypeStruct((b, hq, skv, d), q.dtype, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt, dot, lse, delta, q_seg, kv_seg)

    dq = dq.transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    if group > 1:  # GQA: sum grads over the query-head group
        dk = dk.reshape(b, skv, hkv, group, d).sum(axis=3).astype(k.dtype)
        dv = dv.reshape(b, skv, hkv, group, d).sum(axis=3).astype(v.dtype)
    return dq, dk, dv
