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

    def test_gradients_flow(self):
        b, s, h, d = 1, 128, 2, 64

        def f(q, k, v):
            return flash_attention(
                q, k, v, interpret=True, block_q=128, block_kv=128
            ).sum()

        def f_ref(q, k, v):
            return dot_product_attention(q, k, v, impl="xla").sum()

        args = (_rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2))
        g_ours = jax.grad(f, argnums=(0, 1, 2))(*args)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(*args)
        for a, b_ in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3)
