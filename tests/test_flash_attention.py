"""Pallas flash-attention correctness vs the XLA reference (interpret mode
on the CPU test backend; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


def _cmp(q, k, v, atol=2e-3, **kw):
    ours = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128, **kw)
    ref = dot_product_attention(q, k, v, impl="xla", **kw)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=atol)


class TestFlashAttention:
    def test_full(self):
        b, s, h, d = 1, 256, 2, 64
        _cmp(_rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2))

    def test_causal(self):
        b, s, h, d = 1, 256, 2, 64
        _cmp(
            _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2),
            causal=True,
        )

    def test_gqa(self):
        b, s, d = 1, 256, 64
        q = _rand((b, s, 4, d), 0)
        k = _rand((b, s, 2, d), 1)
        v = _rand((b, s, 2, d), 2)
        _cmp(q, k, v)

    def test_segments_and_padding(self):
        b, s, h, d = 2, 256, 2, 64
        q = _rand((b, s, h, d), 0)
        k = _rand((b, s, h, d), 1)
        v = _rand((b, s, h, d), 2)
        seg = jnp.asarray(np.repeat(np.arange(4), 64)[None].repeat(b, 0))
        pad = jnp.asarray(np.ones((b, s), bool)).at[:, -32:].set(False)
        _cmp(q, k, v, q_segment_ids=seg, kv_segment_ids=seg, pad_mask=pad)

    def test_multi_kv_blocks_online_softmax(self):
        b, s, h, d = 1, 512, 2, 64  # 4 kv blocks at block 128
        _cmp(
            _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5),
            causal=True,
        )

    def test_pad_mask_only_kv_bias_path(self):
        """pad_mask without segment ids lowers to the f32 kv-bias fast path;
        must match the XLA reference exactly like the segment path does."""
        b, s, h, d = 2, 256, 2, 64
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        pad = jnp.asarray(np.ones((b, s), bool)).at[0, -32:].set(False)
        pad = pad.at[1, -96:].set(False)
        _cmp(q, k, v, pad_mask=pad)

    def test_unroll_group_and_tail(self):
        """5 kv blocks = one unroll-4 group + 1 tail block (and causal makes
        the loop bound dynamic); exercises both loops in the kernel."""
        b, s, h, d = 1, 640, 2, 64
        _cmp(
            _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8),
        )
        _cmp(
            _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8),
            causal=True,
        )

    def test_pick_block_prefers_exact_divisor(self):
        """Serving seqs are whatever the bucket table produces; the wrapper
        must find the largest 128-aligned block that divides them (8832 =
        23*384 -> block 384, ZERO padding) instead of falling back to the
        XLA einsum, whose (H, S, S) f32 scores are 6.97GB at this shape
        (observed compile-time RESOURCE_EXHAUSTED in serving warmup)."""
        from gpt_image_edit_tpu.ops.pallas.flash_attention import _pick_block

        assert _pick_block(8832, 512, 128) == (384, 8832)
        assert _pick_block(8704, 512, 128) == (512, 8704)
        # 8872 has no 128-aligned divisor: minimal padding wins (256 -> 8960)
        assert _pick_block(8872, 512, 128) == (256, 8960)
        assert _pick_block(64, 64, 128) is None  # sub-128: caller falls back

    @pytest.mark.parametrize("case", ["pad_mask", "no_mask", "gqa", "causal"])
    def test_ragged_seq_pads_to_block(self, case):
        """Ragged (non-128-multiple) seqs stay on the kernel via tail
        padding: padded KV columns are masked for real rows, padded Q rows
        are sliced off. Parity vs the XLA reference on the REAL rows."""
        b, s, h, d = 2, 333, 2, 64  # 333 -> block 128, padded to 384
        hkv = 1 if case == "gqa" else h
        q = _rand((b, s, h, d), 0)
        k = _rand((b, s, hkv, d), 1)
        v = _rand((b, s, hkv, d), 2)
        kw = {}
        if case == "pad_mask":
            kw = dict(pad_mask=jnp.ones((b, s), bool).at[:, -50:].set(False))
        if case == "causal":
            kw = dict(causal=True)
        ours = flash_attention(q, k, v, interpret=True, **kw)
        ref = dot_product_attention(q, k, v, impl="xla", **kw)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-3)

    def test_ragged_gradients_match_xla(self):
        """The pad/slice wrapping sits OUTSIDE the custom-VJP core, so
        autodiff routes padded-row cotangents to exactly zero; grads on the
        real rows must match the reference."""
        b, s, h, d = 1, 300, 2, 64
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        w = _rand((b, s, h, d), 3)
        pad = jnp.ones((b, s), bool).at[:, -40:].set(False)

        def f(q, k, v):
            return jnp.sum(w * flash_attention(
                q, k, v, pad_mask=pad, interpret=True))

        def f_ref(q, k, v):
            return jnp.sum(w * dot_product_attention(
                q, k, v, pad_mask=pad, impl="xla"))

        g_ours = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("q k v".split(), g_ours, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-3,
                err_msg=f"d{name} (ragged)",
            )

    def test_ragged_q_with_caller_segments_falls_back(self):
        """Caller-provided Q segment ids + ragged Q keep the XLA path (a
        padded row borrowing segment 0 could face zero valid keys -> NaN
        residuals into the bwd kernel); results still correct."""
        b, s, h, d = 1, 333, 2, 64
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        seg = jnp.zeros((b, s), jnp.int32).at[:, 200:].set(1)
        ours = flash_attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, interpret=True)
        ref = dot_product_attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, impl="xla")
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-3)

    def test_ragged_q_with_kv_segments_falls_back(self, monkeypatch):
        """ADVICE r4 #1: kv_segment_ids alone + ragged Q must also take the
        XLA path — a padded Q row borrows segment 0, and a batch row whose
        keys contain no segment-0 entries would give it an empty softmax
        (NaN residuals contaminating dk/dv through the bwd kernel)."""
        from gpt_image_edit_tpu.ops.pallas import flash_attention as fa_mod

        def _boom(*a, **kw):
            raise AssertionError("kernel path must not engage")

        monkeypatch.setattr(fa_mod, "_flash_attention_core", _boom)
        b, s, h, d = 2, 333, 2, 64
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        # batch row 1's keys are ALL segment 1: padded Q rows (implicit
        # segment 0) would have zero valid keys there
        kv_seg = jnp.zeros((b, s), jnp.int32).at[1].set(1)
        ours = fa_mod.flash_attention(
            q, k, v, kv_segment_ids=kv_seg, interpret=True)
        ref = dot_product_attention(
            q, k, v, q_segment_ids=jnp.zeros((b, s), jnp.int32),
            kv_segment_ids=kv_seg, impl="xla")
        # row 0 (seg-0 keys exist) must match; row 1 is caller-degenerate
        np.testing.assert_allclose(
            np.asarray(ours[0]), np.asarray(ref[0]), atol=2e-3)

    @pytest.mark.parametrize(
        "case",
        ["full", "causal", "gqa", "segments", "pad_only"],
    )
    def test_gradients_match_xla(self, case):
        """Pallas bwd kernels (dq/dkv) vs XLA autodiff."""
        b, s, h, d = 1, 256, 4, 64
        hkv = 2 if case == "gqa" else h
        causal = case == "causal"
        kw = {}
        if case == "segments":
            seg = jnp.asarray(np.repeat(np.arange(2), 128)[None])
            kw = dict(q_segment_ids=seg, kv_segment_ids=seg)
        if case == "pad_only":
            # kv-bias fwd path; bwd reconstructs segment ids from the bias
            kw = dict(pad_mask=jnp.ones((b, s), bool).at[:, -64:].set(False))

        q = _rand((b, s, h, d), 0)
        k = _rand((b, s, hkv, d), 1)
        v = _rand((b, s, hkv, d), 2)
        # weighted sum so cotangents aren't uniform
        w = _rand((b, s, h, d), 3)

        def f(q, k, v):
            return jnp.sum(
                w * flash_attention(
                    q, k, v, causal=causal, interpret=True,
                    block_q=128, block_kv=128, **kw,
                )
            )

        def f_ref(q, k, v):
            return jnp.sum(
                w * dot_product_attention(q, k, v, causal=causal, impl="xla", **kw)
            )

        g_ours = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("q k v".split(), g_ours, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-3, err_msg=f"d{name} ({case})"
            )


class TestFlashAttentionInt8:
    """int8-MXU serving kernel (opt-in fast-serving mode, analogous to the
    reference's 4-bit NF4 serving). Gaussian q/k/v with flat attention is the
    worst case for int8 logits — the tiny-FLUX end-to-end test below measures
    the realistic impact."""

    def _rel_err(self, q, k, v, **kw):
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_int8,
        )

        ours = flash_attention_int8(
            q, k, v, interpret=True, block_q=128, block_kv=128, **kw
        )
        ref = dot_product_attention(q, k, v, impl="xla", **kw)
        num = np.linalg.norm(np.asarray(ours, np.float32) - np.asarray(ref, np.float32))
        return num / np.linalg.norm(np.asarray(ref, np.float32))

    def test_full(self):
        b, s, h, d = 1, 256, 2, 64
        err = self._rel_err(
            _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
        )
        assert err < 0.025, err

    def test_multi_kv_blocks(self):
        b, s, h, d = 1, 512, 2, 64
        err = self._rel_err(
            _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
        )
        assert err < 0.025, err

    def test_padding_mask(self):
        b, s, h, d = 2, 256, 2, 64
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        pad = jnp.asarray(np.ones((b, s), bool)).at[:, -64:].set(False)
        err = self._rel_err(q, k, v, pad_mask=pad)
        assert err < 0.025, err

    def test_gqa(self):
        b, s, d = 1, 256, 64
        err = self._rel_err(
            _rand((b, s, 4, d), 0), _rand((b, s, 2, d), 1), _rand((b, s, 2, d), 2)
        )
        assert err < 0.025, err

    def test_causal(self):
        b, s, h, d = 1, 256, 2, 64
        err = self._rel_err(
            _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2),
            causal=True,
        )
        assert err < 0.025, err


class TestFlashAttentionQK8:
    """int8-QK^T / bf16-PV serving kernel (`--quantize w8a8-qk8`): only q/k
    pass through per-row int8, so the error budget is ~3x tighter than the
    full-int8 kernel's p-requantization."""

    def _rel_err(self, q, k, v, **kw):
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_qk8,
        )

        ours = flash_attention_qk8(
            q, k, v, interpret=True, block_q=128, block_kv=128, **kw
        )
        ref = dot_product_attention(q, k, v, impl="xla", **kw)
        num = np.linalg.norm(np.asarray(ours, np.float32) - np.asarray(ref, np.float32))
        return num / np.linalg.norm(np.asarray(ref, np.float32))

    def test_full_and_unroll_tail(self):
        # 5 kv blocks at block 128 with unroll grouping inside the kernel
        b, s, h, d = 1, 640, 2, 64
        err = self._rel_err(
            _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
        )
        assert err < 0.012, err

    def test_padding_mask(self):
        b, s, h, d = 2, 256, 2, 64
        q, k, v = (_rand((b, s, h, d), i + 3) for i in range(3))
        pad = jnp.asarray(np.ones((b, s), bool)).at[:, -64:].set(False)
        err = self._rel_err(q, k, v, pad_mask=pad)
        assert err < 0.012, err

    def test_gqa(self):
        b, s, d = 1, 256, 64
        err = self._rel_err(
            _rand((b, s, 4, d), 6), _rand((b, s, 2, d), 7), _rand((b, s, 2, d), 8)
        )
        assert err < 0.012, err

    def test_dispatch_via_front_end(self):
        b, s, h, d = 1, 256, 2, 64
        q, k, v = (_rand((b, s, h, d), i + 9) for i in range(3))
        out = dot_product_attention(q, k, v, impl="pallas_qk8")
        ref = dot_product_attention(q, k, v, impl="xla")
        rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(
            np.asarray(ref)
        )
        assert rel < 0.012, rel


def test_qk8_ragged_shape_falls_back():
    """A non-block-aligned sequence reaching the qk8 serving kernel must
    degrade to the XLA reference (bf16 semantics) instead of crashing
    (advisor r2: serving requests that escape the resolution buckets)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_image_edit_tpu.ops.attention import dot_product_attention
    from gpt_image_edit_tpu.ops.pallas.flash_attention import flash_attention_qk8

    b, s, h, d = 1, 600, 2, 64  # 600 % 512-block != 0 -> ragged
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    pm = jnp.ones((b, s), bool).at[:, -10:].set(False)

    out = flash_attention_qk8(q, k, v, pad_mask=pm, interpret=True)
    ref = dot_product_attention(q, k, v, pad_mask=pm, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFlashLseVjp:
    """flash_attention_lse's custom VJP (VERDICT r4 #5): both cotangents
    (d_out AND d_lse) must route through the Pallas backward kernels — the
    lse cotangent folds into the backward delta term (d lse/ds = p). This is
    what makes ring/CP attention trainable on the kernel path."""

    @staticmethod
    def _jnp_out_lse(q, k, v, pad_mask=None, scale=None):
        import jax.numpy as jnp

        b, sq, hq, d = q.shape
        _, skv, hkv, _ = k.shape
        g = hq // hkv
        if scale is None:
            scale = d ** -0.5
        kk = jnp.repeat(k, g, axis=2).astype(jnp.float32)
        vv = jnp.repeat(v, g, axis=2).astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kk) * scale
        if pad_mask is not None:
            s = jnp.where(pad_mask[:, None, None, :], s, -1e30)
        m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m)
        if pad_mask is not None:
            p = jnp.where(pad_mask[:, None, None, :], p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhqk,bkhd->bhqd", p / l, vv).transpose(0, 2, 1, 3)
        lse = m[..., 0] + jnp.log(l[..., 0])
        return o.astype(q.dtype), lse

    @pytest.mark.parametrize("case", ["plain", "gqa_pad"])
    def test_grads_match_jnp(self, case):
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_lse,
        )

        if case == "plain":
            b, s, hq, hkv, d = 1, 256, 2, 2, 16
            pad = None
        else:
            b, s, hq, hkv, d = 2, 256, 4, 2, 16
            pad = jnp.asarray(np.ones((b, s), bool)).at[0, -70:].set(False)
        q = _rand((b, s, hq, d), 60)
        k = _rand((b, s, hkv, d), 61)
        v = _rand((b, s, hkv, d), 62)
        g_o = _rand((b, s, hq, d), 63)
        g_l = _rand((b, hq, s), 64)  # nonzero lse cotangent

        def loss(fn):
            def inner(q, k, v):
                o, lse = fn(q, k, v)
                return jnp.sum(o * g_o) + jnp.sum(lse * g_l)
            return inner

        ours = loss(lambda q, k, v: flash_attention_lse(
            q, k, v, pad_mask=pad, block_q=128, block_kv=128, interpret=True))
        ref = loss(lambda q, k, v: self._jnp_out_lse(q, k, v, pad_mask=pad))
        got = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
        exp = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(exp, got):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=3e-5)

    def test_fully_masked_rows_grads_finite(self):
        """A batch row whose keys are ALL masked: fwd gives o=0/finite lse;
        bwd must return finite (zero) grads, not NaN."""
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_lse,
        )

        b, s, h, d = 2, 128, 2, 16
        q, k, v = (_rand((b, s, h, d), 70 + i) for i in range(3))
        pad = jnp.asarray(np.ones((b, s), bool)).at[1].set(False)

        def loss(q, k, v):
            o, lse = flash_attention_lse(
                q, k, v, pad_mask=pad, block_q=128, block_kv=128,
                interpret=True)
            return jnp.sum(o ** 2) + jnp.sum(jnp.where(pad, lse[:, 0], 0.0))

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g in grads:
            arr = np.asarray(g)
            assert np.isfinite(arr).all()
        # masked row contributes nothing
        assert np.abs(np.asarray(grads[1])[1]).max() == 0.0
        assert np.abs(np.asarray(grads[2])[1]).max() == 0.0
