"""int8 weight-only quantization: roundtrip error, tree rebuild, model use."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.common import linear
from gpt_image_edit_tpu.utils.quantize import (
    dequantize_kernel,
    params_nbytes,
    quantize_kernel,
    quantize_params,
)


class TestQuantize:
    def test_roundtrip_error(self):
        k = jax.random.normal(jax.random.key(0), (64, 128))
        qk = quantize_kernel(k)
        back = dequantize_kernel(qk, jnp.float32)
        rel = float(jnp.max(jnp.abs(back - k)) / jnp.max(jnp.abs(k)))
        assert rel < 0.01  # int8 per-channel: < 1% of channel max

    def test_stacked_kernel(self):
        k = jax.random.normal(jax.random.key(1), (3, 32, 64))  # (L, in, out)
        qk = quantize_kernel(k)
        assert qk["q"].shape == (3, 32, 64)
        assert qk["scale"].shape == (3, 1, 64)

    def test_tree_structure_and_linear(self):
        params = {
            "a": {"kernel": jax.random.normal(jax.random.key(0), (64, 64)),
                  "bias": jnp.zeros(64)},
            "blocks": {"kernel": jax.random.normal(jax.random.key(1), (2, 64, 64))},
            "small": {"kernel": jnp.ones((2, 2))},
        }
        q = quantize_params(params, min_size=1024)
        assert isinstance(q["a"]["kernel"], dict)       # quantized
        assert isinstance(q["blocks"]["kernel"], dict)
        assert not isinstance(q["small"]["kernel"], dict)  # below min_size
        assert params_nbytes(q) < params_nbytes(params) / 2

        x = jax.random.normal(jax.random.key(2), (4, 64))
        y_f = linear(params["a"], x)
        y_q = linear(q["a"], x)
        rel = float(jnp.linalg.norm(y_f - y_q) / jnp.linalg.norm(y_f))
        assert rel < 0.02
