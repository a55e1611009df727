"""Fused Pallas ln+modulate+quant kernel (VERDICT r4 #2) vs the unfused jnp
chain it replaces — kernel-level parity and full-model W8A8 parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_image_edit_tpu.models.common import quantize_rows
from gpt_image_edit_tpu.ops.norms import layer_norm, modulate
from gpt_image_edit_tpu.ops.pallas.fused_quant import ln_modulate_quant_rows


def _rand(shape, seed, dtype=jnp.bfloat16):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype
    )


class TestFusedLnModQuant:
    @pytest.mark.parametrize("shape", [(2, 256, 128), (1, 384, 256)])
    def test_matches_unfused_chain(self, shape):
        b, s, d = shape
        x = _rand(shape, 0)
        shift = _rand((b, d), 1) * 0.1
        scale = _rand((b, d), 2) * 0.1

        q_ref, s_ref = quantize_rows(
            modulate(layer_norm(x, eps=1e-6), shift, scale)
        )
        q, s_x = ln_modulate_quant_rows(
            x, shift, scale, block_rows=128, interpret=True
        )
        assert q.dtype == jnp.int8 and s_x.shape == (b, s, 1)
        # scales agree to ONE bf16 ulp of the row max: fp32 LN reduce-order
        # noise can flip which element wins the bf16-rounded absmax
        np.testing.assert_allclose(
            np.asarray(s_x), np.asarray(s_ref), rtol=1e-2
        )
        # int8 codes may differ by 1 LSB on round ties; dequantized values
        # agree to 2 LSB (1 code + the scale ulp above)
        dq = np.asarray(q, np.float32) * np.asarray(s_x)
        dref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
        lsb = np.asarray(s_ref)
        assert (np.abs(dq - dref) <= lsb * 2.01).all()
        assert (np.abs(np.asarray(q, np.int32)
                       - np.asarray(q_ref, np.int32)) <= 1).mean() == 1.0

    def test_unaligned_raises(self):
        x = _rand((1, 100, 128), 3)
        with pytest.raises(ValueError):
            ln_modulate_quant_rows(
                x, _rand((1, 128), 4), _rand((1, 128), 5),
                block_rows=64, interpret=True,
            )

    def test_dispatcher_fallback_and_fused(self, monkeypatch):
        """ln_modulate_quant: QuantRows on the fused path, bf16 tensor when
        off or unaligned."""
        from gpt_image_edit_tpu.models.common import (
            QuantRows, ln_modulate_quant,
        )
        from gpt_image_edit_tpu.utils.quantize import quantize_kernel

        probe = {"kernel": quantize_kernel(
            _rand((128, 64), 6, jnp.float32), mode="w8a8"
        )}
        x = _rand((1, 256, 128), 7)
        sh, sc = _rand((1, 128), 8) * 0.1, _rand((1, 128), 9) * 0.1

        monkeypatch.setenv("GIE_FUSE_MOD_QUANT", "0")
        out = ln_modulate_quant(x, sh, sc, probe)
        assert not isinstance(out, QuantRows)

        monkeypatch.setenv("GIE_FUSE_MOD_QUANT", "interpret")
        out = ln_modulate_quant(x, sh, sc, probe)
        assert isinstance(out, QuantRows) and out.shape == x.shape

        # unaligned sequence -> jnp chain even when enabled
        x_odd = _rand((1, 100, 128), 10)
        out = ln_modulate_quant(x_odd, sh, sc, probe)
        assert not isinstance(out, QuantRows)

        # non-W8A8 probe -> jnp chain
        out = ln_modulate_quant(x, sh, sc, {"kernel": _rand((128, 64), 11)})
        assert not isinstance(out, QuantRows)

    def test_w8a8_flux_forward_fused_parity(self, monkeypatch):
        """Full tiny-FLUX W8A8 forward with the fused prologue vs without:
        identical up to 1-LSB quant-code ties (the only divergence source).
        Shapes chosen 128-aligned so every ln+mod+quant site takes the
        fused kernel (hidden 128, S_img 256, S_txt 128)."""
        from gpt_image_edit_tpu.models.flux import (
            FluxConfig, apply_flux, init_flux,
        )
        from gpt_image_edit_tpu.ops.packing import latent_image_ids
        from gpt_image_edit_tpu.utils.quantize import quantize_params

        cfg = FluxConfig.tiny()
        params = init_flux(jax.random.key(0), cfg)
        qp = quantize_params(params, min_size=1024, mode="w8a8")
        kw = dict(
            hidden_states=jax.random.normal(
                jax.random.key(1), (1, 256, cfg.in_channels)
            ),
            encoder_hidden_states=jax.random.normal(
                jax.random.key(2), (1, 128, cfg.joint_attention_dim)
            ),
            pooled_projections=jnp.zeros((1, cfg.pooled_projection_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=latent_image_ids(16, 16),
            guidance=jnp.full((1,), 3.5),
        )
        monkeypatch.setenv("GIE_FUSE_MOD_QUANT", "0")
        o_plain = apply_flux(qp, cfg, **kw)
        monkeypatch.setenv("GIE_FUSE_MOD_QUANT", "interpret")
        o_fused = apply_flux(qp, cfg, **kw)
        rel = float(
            jnp.linalg.norm(
                o_fused.astype(jnp.float32) - o_plain.astype(jnp.float32)
            ) / jnp.linalg.norm(o_plain.astype(jnp.float32))
        )
        assert rel < 5e-3, rel
