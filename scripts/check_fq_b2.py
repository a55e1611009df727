#!/usr/bin/env python
"""One-chip TPU validation of the fused ln+modulate+quant kernel at batch>1.

The max_batch=2 coalesced serving bench exposed a Mosaic lowering reject:
shift/scale were fed as (B, D) with a (1, D) block, which violates the
divisible-by-(8,128)-or-full-dim rule whenever B > 1 (the CPU interpreter
does not enforce it, so CI stayed green). The fix reshapes them to
(B, 1, D); this script proves the kernel lowers AND runs at B=1/2/4 on the
real chip at the serving feature width.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpt_image_edit_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.common import quantize_rows
from gpt_image_edit_tpu.ops.norms import layer_norm, modulate
from gpt_image_edit_tpu.ops.pallas.fused_quant import ln_modulate_quant_rows


def main():
    print("backend:", jax.default_backend())
    for b in (1, 2, 4):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, 512, 3072)),
            jnp.bfloat16,
        )
        sh = jnp.asarray(
            np.random.default_rng(1).standard_normal((b, 3072)), jnp.bfloat16
        ) * 0.1
        sc = jnp.asarray(
            np.random.default_rng(2).standard_normal((b, 3072)), jnp.bfloat16
        ) * 0.1
        q, s = ln_modulate_quant_rows(x, sh, sc, block_rows=256)
        qr, sr = quantize_rows(modulate(layer_norm(x, eps=1e-6), sh, sc))
        ok = float(
            jnp.mean(jnp.abs(q.astype(jnp.int32) - qr.astype(jnp.int32)) <= 1)
        )
        print(f"b={b} lowered+ran, 1-LSB agreement={ok:.4f}")
        assert ok == 1.0, (b, ok)
    print("OK")


if __name__ == "__main__":
    main()
