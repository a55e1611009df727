"""Numerics tests for core ops: packing, rope, norms, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import layer_norm, rms_norm
from gpt_image_edit_tpu.ops.packing import latent_image_ids, pack_latents, unpack_latents
from gpt_image_edit_tpu.ops.rope import (
    apply_rope_halves,
    apply_rope_paired,
    flux_rope_freqs,
    mrope_freqs,
)


class TestPacking:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 6, 16))
        packed = pack_latents(x)
        assert packed.shape == (2, 4 * 3, 64)
        back = unpack_latents(packed, 8, 6)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_matches_reference_nchw_ordering(self):
        """Packed channel order must equal the torch NCHW
        view(B,C,H/2,2,W/2,2).permute(0,2,4,1,3,5) flattening."""
        import torch

        b, c, h, w = 2, 16, 4, 6
        xt = torch.arange(b * c * h * w, dtype=torch.float32).reshape(b, c, h, w)
        ref = (
            xt.view(b, c, h // 2, 2, w // 2, 2)
            .permute(0, 2, 4, 1, 3, 5)
            .reshape(b, (h // 2) * (w // 2), c * 4)
            .numpy()
        )
        x_nhwc = jnp.asarray(xt.permute(0, 2, 3, 1).numpy())
        ours = np.asarray(pack_latents(x_nhwc))
        np.testing.assert_array_equal(ours, ref)

    def test_latent_ids(self):
        ids = np.asarray(latent_image_ids(3, 2, modality=1))
        assert ids.shape == (6, 3)
        assert (ids[:, 0] == 1).all()
        assert ids[0].tolist() == [1, 0, 0]
        assert ids[1].tolist() == [1, 0, 1]
        assert ids[2].tolist() == [1, 1, 0]
        assert ids[-1].tolist() == [1, 2, 1]


class TestRope:
    def test_flux_rope_matches_complex_rotation(self):
        """Paired rotation == complex multiply by e^{i angle}."""
        ids = jnp.asarray(
            np.stack(
                [np.zeros(12), np.repeat(np.arange(4), 3), np.tile(np.arange(3), 4)],
                axis=1,
            ),
            dtype=jnp.float32,
        )
        axes = (4, 6, 6)
        cos, sin = flux_rope_freqs(ids, axes, theta=100.0)
        assert cos.shape == (12, 16)

        x = jax.random.normal(jax.random.key(1), (1, 2, 12, 16))
        out = apply_rope_paired(x, cos, sin)

        xc = np.asarray(x[..., 0::2]) + 1j * np.asarray(x[..., 1::2])
        angle = np.arccos(np.clip(np.asarray(cos[:, 0::2]), -1, 1))
        # reconstruct signed angle from sin
        angle = np.where(np.asarray(sin[:, 0::2]) < 0, -angle, angle)
        expected = xc * np.exp(1j * angle)
        np.testing.assert_allclose(np.asarray(out[..., 0::2]), expected.real, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[..., 1::2]), expected.imag, atol=1e-5)

    def test_mrope_matches_transformers(self):
        """Golden test against HF Qwen2.5-VL's rope application."""
        torch = pytest.importorskip("torch")
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            apply_multimodal_rotary_pos_emb,
        )

        head_dim, b, s, h = 32, 2, 10, 3
        sections = [4, 6, 6]
        theta = 10000.0
        rng = np.random.default_rng(0)
        pos = rng.integers(0, 50, size=(3, b, s))

        cos, sin = mrope_freqs(jnp.asarray(pos), head_dim, sections, theta)

        # HF path
        inv_freq = 1.0 / (theta ** (np.arange(0, head_dim // 2) * 2.0 / head_dim))
        angles = (pos[..., None] * inv_freq).astype(np.float32)  # (3, b, s, half)
        emb = np.concatenate([angles, angles], axis=-1)
        cos_t = torch.tensor(np.cos(emb), dtype=torch.float32)
        sin_t = torch.tensor(np.sin(emb), dtype=torch.float32)

        q = rng.standard_normal((b, h, s, head_dim)).astype(np.float32)
        k = rng.standard_normal((b, h, s, head_dim)).astype(np.float32)
        q_ref, k_ref = apply_multimodal_rotary_pos_emb(
            torch.tensor(q), torch.tensor(k), cos_t, sin_t, sections
        )

        q_ours = apply_rope_halves(jnp.asarray(q), cos, sin)
        k_ours = apply_rope_halves(jnp.asarray(k), cos, sin)
        np.testing.assert_allclose(np.asarray(q_ours), q_ref.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(k_ours), k_ref.numpy(), atol=5e-4)


class TestNorms:
    def test_rms_norm_matches_torch(self):
        import torch

        x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
        w = np.random.default_rng(1).standard_normal(16).astype(np.float32)
        ref = torch.nn.functional.rms_norm(
            torch.tensor(x), (16,), torch.tensor(w), eps=1e-6
        ).numpy()
        ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_layer_norm_no_affine(self):
        import torch

        x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
        ref = torch.nn.functional.layer_norm(torch.tensor(x), (16,), eps=1e-6).numpy()
        ours = np.asarray(layer_norm(jnp.asarray(x), eps=1e-6))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAttention:
    def _naive(self, q, k, v, mask=None, scale=None):
        scale = scale or q.shape[-1] ** -0.5
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if mask is not None:
            logits = np.where(mask, logits, -1e30)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        return np.einsum("bhqk,bkhd->bqhd", probs, v)

    def test_full(self):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((2, 6, 4, 8)).astype(np.float32)
        k = rng.standard_normal((2, 6, 4, 8)).astype(np.float32)
        v = rng.standard_normal((2, 6, 4, 8)).astype(np.float32)
        out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
        np.testing.assert_allclose(np.asarray(out), self._naive(q, k, v), atol=1e-5)

    def test_causal(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((1, 5, 2, 8)).astype(np.float32)
        k, v = q.copy(), rng.standard_normal((1, 5, 2, 8)).astype(np.float32)
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, impl="xla"
        )
        mask = np.tril(np.ones((5, 5), bool))[None, None]
        np.testing.assert_allclose(np.asarray(out), self._naive(q, k, v, mask), atol=1e-5)

    def test_gqa(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
        k = rng.standard_normal((1, 4, 2, 8)).astype(np.float32)
        v = rng.standard_normal((1, 4, 2, 8)).astype(np.float32)
        out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
        k_rep = np.repeat(k, 2, axis=2)
        v_rep = np.repeat(v, 2, axis=2)
        np.testing.assert_allclose(np.asarray(out), self._naive(q, k_rep, v_rep), atol=1e-5)

    def test_segments_and_padding(self):
        rng = np.random.default_rng(3)
        b, s, h, d = 2, 8, 2, 8
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        seg = np.array([[0, 0, 0, 1, 1, 1, 2, 2]] * b)
        pad = np.ones((b, s), bool)
        pad[:, -1] = False
        out = dot_product_attention(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            q_segment_ids=jnp.asarray(seg),
            kv_segment_ids=jnp.asarray(seg),
            pad_mask=jnp.asarray(pad),
            impl="xla",
        )
        mask = (seg[:, None, :, None] == seg[:, None, None, :]) & pad[:, None, None, :]
        np.testing.assert_allclose(np.asarray(out), self._naive(q, k, v, mask), atol=1e-5)
