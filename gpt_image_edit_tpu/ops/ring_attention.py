"""Ring attention: context/sequence-parallel attention over a mesh axis.

The reference has no sequence parallelism (its max joint sequence, 8704
tokens at 1024^2 + one reference image, fits one GPU); SURVEY §5 reserved a
`sequence` mesh axis for it. This module makes that axis real: Q stays
local to each shard, K/V (and the per-key pad mask) rotate around the ring
via `jax.lax.ppermute`, and an online-softmax carry merges the per-hop
partials — the TPU-native formulation of Ring Attention (ICI neighbor
exchange instead of NCCL P2P), with compute/communication overlap left to
XLA's async collective scheduling.

Written as plain jnp ops inside `lax.scan`, so `jax.grad` differentiates it
through ppermute's transpose rule — no custom VJP needed; the backward pass
is itself a ring (reverse permutation) by construction.

Use `ring_attention` INSIDE a `shard_map` over the sequence axis (q/k/v are
the local shards), or the `context_parallel_attention` convenience wrapper
which shard_maps a globally-sharded BSHD tensor for you.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class _FlashPlan:
    """Blocking + padding that makes a CP shard Mosaic-legal (VERDICT r4 #5).

    Mosaic needs 128-aligned blocks, and real CP shard lengths rarely have a
    128-multiple divisor (8704/8 = 1088 does not) — so instead of falling
    back to jnp hops, pad to the chosen block exactly like the single-chip
    serving path does for ragged sequences (flash_attention's _pick_block):
    padded Q rows are sliced off the output (their cotangent is exactly
    zero), padded keys rotate around the ring mask-False."""

    __slots__ = ("bq", "sq_pad", "bkv", "skv_pad")

    def __init__(self, sq: int, skv: int, block_kv_req: int):
        from gpt_image_edit_tpu.ops.pallas.flash_attention import _pick_block

        self.bq, self.sq_pad = _pick_block(sq, 512, 128)
        req = max(128, block_kv_req - block_kv_req % 128)
        self.bkv, self.skv_pad = _pick_block(skv, req, 128)

    def pad_ratio(self, sq: int, skv: int) -> float:
        return max(self.sq_pad / sq, self.skv_pad / skv)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    pad_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_kv: int = 512,
    hop_impl: str = "jnp",
    _flash_interpret: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel attention on per-shard inputs (call under shard_map).

    Args:
      q: (B, Sq_local, Hq, D) — this shard's queries (stay resident).
      k, v: (B, Skv_local, Hkv, D) — this shard's keys/values (rotate).
      axis_name: mesh axis the sequence dim is sharded over.
      pad_mask: (B, Skv_local) bool — this shard's key validity (rotates
        with K/V). 1 = attend.
      causal: global causal mask; uses global token positions reconstructed
        from the shard index, assuming equal contiguous shards in ring order.
      scale: defaults to D ** -0.5.
      hop_impl: per-hop compute. "jnp" (default) = blocked online softmax in
        jnp — differentiable end-to-end (jax.grad flows through ppermute's
        transpose rule). "flash" = the Pallas resident kernel per hop
        (VERDICT r3 #7) with cross-hop logsumexp merging — non-causal only;
        unaligned shard lengths are padded to 128-aligned blocks, and the
        kernel's custom VJP makes this path trainable too (VERDICT r4 #5).
        "auto" = flash when on TPU, non-causal, and padding overhead <=25%.
      _flash_interpret: run the Pallas hop in interpreter mode (CPU tests).
    Returns: (B, Sq_local, Hq, D) in q.dtype.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    assert hq % hkv == 0, f"GQA requires Hq % Hkv == 0, got {hq}, {hkv}"
    g = hq // hkv  # GQA group size: K/V rotate un-repeated (Hkv wide) so
    # ppermute ICI payloads stay at Hkv; heads expand inside the hop via
    # grouped einsums (head index = kv_head * g + group_member, matching
    # jnp.repeat(axis=2) ordering).

    n = jax.lax.psum(1, axis_name)          # ring size (static)
    idx = jax.lax.axis_index(axis_name)     # this shard's position
    perm = [(i, (i - 1) % n) for i in range(n)]  # receive from the right:
    # after hop t, this shard holds the K/V of shard (idx + t) % n, so every
    # shard sees every KV block exactly once over n hops.

    if pad_mask is None:  # replicated literal -> shard-varying (it rotates)
        pad_mask = jax.lax.pcast(
            jnp.ones((b, skv), jnp.bool_), (axis_name,), to="varying"
        )
    pad_mask = pad_mask.astype(jnp.bool_)

    q_pos = idx * sq + jnp.arange(sq)  # global query positions

    # per-hop Pallas flash kernel (VERDICT r3 #7 / r4 #5): eligible whenever
    # non-causal (the MMDiT joint-attention CP case) — unaligned shard
    # lengths are PADDED to 128-aligned blocks rather than falling back to
    # jnp. Differentiable via flash_attention_lse's custom VJP, so CP
    # training uses the kernel too. The hop returns a normalized partial
    # (o_t, lse_t) that merges into the same (m, l, acc) carry — see
    # flash_attention_lse's docstring for the exact merge.
    assert hop_impl in ("jnp", "flash", "auto"), hop_impl
    plan = _FlashPlan(sq, skv, block_kv) if not causal else None
    if hop_impl == "auto":
        # engage on TPU (or interpret tests) when padding overhead is small;
        # tiny shards (e.g. 16-token CPU test shards -> 8x pad) stay on jnp
        use_flash = (plan is not None and plan.pad_ratio(sq, skv) <= 1.25
                     and (_flash_interpret or jax.default_backend() == "tpu"))
    elif hop_impl == "flash":
        assert plan is not None, (
            f"hop_impl='flash' needs non-causal (causal={causal})"
        )
        use_flash = True
    else:
        use_flash = False

    # Blocked online softmax within each hop (flash-attention structure in
    # jnp): scores materialize only one (Sq_local, block_kv) tile at a time,
    # q/k/v stay in their input dtype on the MXU (fp32 accumulation via
    # preferred_element_type), and probs are cast to v.dtype for the PV dot
    # exactly like the Pallas kernel. Pure jnp -> jax.grad still
    # differentiates the whole ring through ppermute's transpose rule.
    block = plan.bkv if use_flash else min(block_kv, skv)
    pad_len = (plan.skv_pad - skv) if use_flash else (-skv) % block
    if pad_len:  # pad KV once before the ring; padded keys are mask-False
        zk = jnp.zeros((b, pad_len, hkv, d), k.dtype)
        k = jnp.concatenate([k, zk], axis=1)
        v = jnp.concatenate([v, jnp.zeros((b, pad_len, hkv, d), v.dtype)], axis=1)
        pad_mask = jnp.concatenate(
            [pad_mask, jnp.zeros((b, pad_len), jnp.bool_)], axis=1
        )
    nb = (skv + pad_len) // block
    q5 = q.reshape(b, sq, hkv, g, d)

    pad_q = plan.sq_pad - sq if use_flash else 0
    q_hop = q
    if pad_q:  # padded Q rows are sliced off the output after the ring
        q_hop = jnp.concatenate(
            [q, jnp.zeros((b, pad_q, hq, d), q.dtype)], axis=1
        )
    if use_flash:
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_lse,
        )

    def hop_flash(carry, t):
        k_c, v_c, mask_c, m, l, acc = carry
        o_t, lse_t = flash_attention_lse(
            q_hop, k_c, v_c, pad_mask=mask_c, scale=scale,
            block_q=plan.bq, block_kv=block, interpret=_flash_interpret,
            out_vma={axis_name},  # shard_map check_vma: outputs vary per hop
        )
        lse_t = lse_t[..., None]                       # (B, Hq, Sq, 1)
        m_new = jnp.maximum(m, lse_t)
        alpha = jnp.exp(m - m_new)                     # old-carry rescale
        beta = jnp.exp(lse_t - m_new)                  # this hop's weight
        l = alpha * l + beta
        # (B, Hq, Sq, 1) -> (B, Sq, Hq, 1) to scale the BSHD accumulator
        to_bshd = lambda x: x[..., 0].transpose(0, 2, 1)[..., None]
        acc = acc * to_bshd(alpha) + o_t.astype(jnp.float32) * to_bshd(beta)
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        mask_n = jax.lax.ppermute(mask_c, axis_name, perm)
        return (k_n, v_n, mask_n, m_new, l, acc), None

    def hop(carry, t):
        k_c, v_c, mask_c, m, l, acc = carry
        src = (idx + t) % n  # whose KV block this hop holds

        def block_step(inner, i):
            m, l, acc = inner
            kb = jax.lax.dynamic_slice_in_dim(k_c, i * block, block, axis=1)
            vb = jax.lax.dynamic_slice_in_dim(v_c, i * block, block, axis=1)
            mb = jax.lax.dynamic_slice_in_dim(mask_c, i * block, block, axis=1)
            s = jnp.einsum(
                "bqhgd,bkhd->bhgqk", q5, kb,
                preferred_element_type=jnp.float32,
            ).reshape(b, hq, sq, block) * scale
            keep = mb[:, None, None, :]
            if causal:
                # positions index the ORIGINAL skv; padded tail keys carry
                # out-of-range positions but are already mask-False
                k_pos = src * skv + i * block + jnp.arange(block)
                keep = jnp.logical_and(
                    keep, (k_pos[None, :] <= q_pos[:, None])[None, None]
                )
            s = jnp.where(keep, s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(s - m_new)
            p = jnp.where(keep, p, 0.0)
            alpha = jnp.exp(m - m_new)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum(
                "bhgqk,bkhd->bqhgd",
                p.reshape(b, hkv, g, sq, block).astype(vb.dtype), vb,
                preferred_element_type=jnp.float32,
            ).reshape(b, sq, hq, d)
            # alpha is (B, H, Sq, 1); the accumulator is BSHD
            acc = acc * alpha[..., 0].transpose(0, 2, 1)[..., None] + pv
            return (m_new, l, acc), None

        (m, l, acc), _ = jax.lax.scan(
            block_step, (m, l, acc), jnp.arange(nb)
        )
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        mask_n = jax.lax.ppermute(mask_c, axis_name, perm)
        return (k_n, v_n, mask_n, m, l, acc), None

    sq_c = sq + pad_q  # carry length (padded on the flash path)
    m0 = jnp.full((b, hq, sq_c, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hq, sq_c, 1), jnp.float32)
    a0 = jnp.zeros((b, sq_c, hq, d), jnp.float32)
    # replicated literals -> per-shard ("varying") values, as the scan carry
    # becomes shard-varying after the first ppermute hop
    m0, l0, a0 = (
        jax.lax.pcast(x, (axis_name,), to="varying") for x in (m0, l0, a0)
    )
    (_, _, _, m, l, acc), _ = jax.lax.scan(
        hop_flash if use_flash else hop,
        (k, v, pad_mask, m0, l0, a0), jnp.arange(n)
    )
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
    # (B, H, Sq, 1) -> (B, Sq, H, 1) to divide the BSHD accumulator
    denom = l[..., 0].transpose(0, 2, 1)[..., None]
    out = (acc / denom).astype(q.dtype)
    if pad_q:  # drop padded Q rows (their upstream cotangent is exactly 0)
        out = out[:, :sq]
    return out


def _mesh_axis_sizes(mesh: Optional[Mesh]) -> dict:
    """Axis-name -> size for `mesh`, or the ambient (abstract) mesh when
    mesh is None — the same resolution shard_map itself performs."""
    if mesh is not None:
        return dict(mesh.shape)
    am = jax.sharding.get_abstract_mesh()
    if am is None or not am.shape:  # pragma: no cover - defensive
        raise ValueError(
            "context_parallel_attention needs a mesh: pass mesh= or call "
            "under jax.sharding.set_mesh / inside a jit whose arguments "
            "carry NamedShardings"
        )
    return dict(am.shape)


def context_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = "sequence",
    pad_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_kv: int = 512,
    hop_impl: str = "jnp",
    batch_axes: tuple = ("data", "fsdp"),
    head_axes: tuple = ("tensor",),
    _flash_interpret: bool = False,
) -> jnp.ndarray:
    """Globally-shaped convenience wrapper: shards the sequence dim of BSHD
    q/k/v over `axis_name`, runs ring_attention, returns the global output
    (sharded the same way). Sq and Skv must divide the axis size.

    Two shard_map modes, picked by the hop implementation:

    - jnp hops: PARTIAL-MANUAL (`axis_names={axis_name}`) — only the
      sequence axis goes manual; batch/head dims and every surrounding
      computation (parameter shardings, data parallelism) stay under GSPMD.
      This is what lets `dot_product_attention(impl="ring")` drop into the
      middle of the jitted FLUX train step.
    - flash (Pallas) hops: FULL-MANUAL over every mesh axis, because a
      Mosaic custom call inside a partial-manual region fails to lower on
      real TPU ("Mosaic kernels cannot be automatically partitioned" —
      measured on-chip, scripts/check_ring_tpu.py; the CPU interpreter has
      the mirror-image restriction, see tests/test_ring_attention.py). The
      batch dim shards over `batch_axes` and the head dim over `head_axes`
      (each filtered to axes present in the mesh whose product divides the
      dim — matching the repo's activation conventions: batch over
      (data, fsdp), attention heads over tensor via the qkv projection's
      P(fsdp, tensor) kernels). If the caller's actual layout differs,
      GSPMD inserts the reshard — correctness never depends on the hint.
      check_vma=False, as everywhere this repo composes pallas_call with
      full-manual shard_map.

    `hop_impl="auto"` resolves HERE (flash on TPU / interpret tests when
    non-causal and the per-shard 128-alignment padding is <=25%) so the
    shard_map mode can follow the decision. With ``mesh=None`` the ambient
    mesh is used — call under ``jax.sharding.set_mesh(mesh)`` (or inside a
    jit whose arguments carry NamedShardings of that mesh)."""
    b, sq, hq, _ = q.shape
    _, skv, hkv, _ = k.shape

    assert hop_impl in ("jnp", "flash", "auto"), hop_impl
    if hop_impl != "jnp":
        # mesh resolution is needed only to size the per-shard flash plan;
        # the jnp path keeps the old behavior (shard_map resolves the
        # ambient mesh itself)
        axes = _mesh_axis_sizes(mesh)
        seq_n = axes[axis_name]
        assert sq % seq_n == 0 and skv % seq_n == 0, (
            f"sequence dims ({sq}, {skv}) must divide the '{axis_name}' "
            f"axis ({seq_n})"
        )
        plan = _FlashPlan(sq // seq_n, skv // seq_n, block_kv) \
            if not causal else None
        if hop_impl == "flash":
            assert plan is not None, "hop_impl='flash' needs non-causal"
            use_flash = True
        else:
            use_flash = (
                plan is not None
                and plan.pad_ratio(sq // seq_n, skv // seq_n) <= 1.25
                and (_flash_interpret or jax.default_backend() == "tpu")
            )
    else:
        use_flash = False

    fn = functools.partial(
        ring_attention, axis_name=axis_name, causal=causal, scale=scale,
        block_kv=block_kv, hop_impl="flash" if use_flash else "jnp",
        _flash_interpret=_flash_interpret,
    )

    if use_flash:
        def _fit(cands, dim):
            picked = tuple(a for a in cands if axes.get(a, 1) > 1)
            while picked:
                n = 1
                for a in picked:
                    n *= axes[a]
                if dim % n == 0:
                    return picked
                picked = picked[:-1]
            return ()

        b_ax = _fit(batch_axes, b)
        h_ax = _fit(head_axes, hq)
        if h_ax and any(hkv % axes[a] for a in h_ax):
            h_ax = ()  # GQA: shard heads only when K/V heads split too
        qspec = P(b_ax or None, axis_name, h_ax or None, None)
        mspec = P(b_ax or None, axis_name)
        kw = dict(out_specs=qspec, check_vma=False)
    else:
        qspec = P(None, axis_name, None, None)
        mspec = P(None, axis_name)
        kw = dict(out_specs=qspec, axis_names=frozenset({axis_name}))
    if mesh is not None:
        kw["mesh"] = mesh

    if pad_mask is not None:
        def mapped(q, k, v, pm):
            return fn(q, k, v, pad_mask=pm)
        out = jax.shard_map(
            mapped, in_specs=(qspec, qspec, qspec, mspec), **kw
        )(q, k, v, pad_mask)
    else:
        def mapped(q, k, v):
            return fn(q, k, v)
        out = jax.shard_map(
            mapped, in_specs=(qspec, qspec, qspec), **kw
        )(q, k, v)
    return out
