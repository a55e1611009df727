#!/usr/bin/env python
"""Isolate the batch-2 serving 'TPU worker crashed' fault (serving bench,
2026-08-20 06:04): the first coalesced max_batch=2 edit killed the TPU
worker inside the batched denoise scan. B=1 at identical shapes serves
fine, and r4 measured a B=2 scan at joint 8704 (512-row flash blocks), so
the suspects are the kernels at the B=2 x server-padded-8832 combinations
that have never run on hardware:

  1. fused ln+modulate+quant at (2, 8832, 3072) blk 384 / (2, 8192, 3072)
     blk 512 / (2, 640, 3072) blk 128
  2. flash attention at B=2, S=8832, 24 heads, block 384

Each stage runs separately (own jit) so the crash names its kernel.
Usage: python scripts/check_b2_serving_kernels.py [--stage fq|flash|all]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpt_image_edit_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def check_fq() -> None:
    from gpt_image_edit_tpu.models.common import _row_block, quantize_rows
    from gpt_image_edit_tpu.ops.norms import layer_norm, modulate
    from gpt_image_edit_tpu.ops.pallas.fused_quant import ln_modulate_quant_rows

    rng = np.random.default_rng(0)
    for s_len in (640, 8192, 8832):
        blk = _row_block(s_len)
        x = jnp.asarray(rng.standard_normal((2, s_len, 3072)), jnp.bfloat16)
        sh = jnp.asarray(rng.standard_normal((2, 3072)), jnp.bfloat16) * 0.1
        sc = jnp.asarray(rng.standard_normal((2, 3072)), jnp.bfloat16) * 0.1
        q, s = ln_modulate_quant_rows(x, sh, sc, block_rows=blk)
        qr, _ = quantize_rows(modulate(layer_norm(x, eps=1e-6), sh, sc))
        ok = float(jnp.mean(
            jnp.abs(q.astype(jnp.int32) - qr.astype(jnp.int32)) <= 1))
        print(f"fq B=2 S={s_len} blk={blk}: ran, 1-LSB agree {ok:.4f}",
              flush=True)
        assert ok == 1.0


def check_flash() -> None:
    from gpt_image_edit_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(1)
    b, s, h, d = 2, 8832, 24, 128

    def mk():
        return jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

    q, k, v = mk(), mk(), mk()
    pm = jnp.asarray(np.arange(s) < 8704, bool)[None].repeat(b, 0)
    out = jax.jit(lambda q, k, v, pm: dot_product_attention(
        q, k, v, pad_mask=pm))(q, k, v, pm)
    print(f"flash B=2 S={s}: ran, sum {_sync(out):.3f}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["fq", "flash", "all"])
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if args.stage in ("fq", "all"):
        check_fq()
    if args.stage in ("flash", "all"):
        check_flash()
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
