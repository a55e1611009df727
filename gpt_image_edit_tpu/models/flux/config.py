"""FLUX.1 (dev / Kontext-dev) MMDiT configuration.

Matches the diffusers FluxTransformer2DModel config shipped inside the
reference's merged checkpoint (ref:univa/models/modeling_univa_denoise_tower.py:20-21,
ref:scripts/make_univa_qwen2p5vl_weight.py:66-72): 19 dual-stream +
38 single-stream blocks, 24 heads x 128, guidance-distilled.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19            # dual-stream (MMDiT) blocks
    num_single_layers: int = 38     # single-stream blocks
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096   # text conditioning width
    pooled_projection_dim: int = 768  # CLIP pooled width
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0
    time_embed_dim: int = 256
    # jax.remat on each block body (the reference's gradient_checkpointing,
    # ref:train_denoiser.py:484-486)
    remat: bool = False
    # remat policy: "nothing" saves only block boundaries (minimum memory,
    # full re-forward on bwd); "dots" saves matmul outputs (XLA's
    # dots_saveable) so the bwd recompute is elementwise-only — more HBM,
    # fewer re-forward FLOPs (the 4x-vs-3x accounting gap). Pick per mesh:
    # fsdp-sharded multi-chip usually affords "dots".
    remat_policy: str = "nothing"
    # attention dispatch: "auto" | "xla" | "pallas" | "ring" | "pallas_qk8"
    # | "pallas_int8". "ring" = context parallelism: sequence dim sharded
    # over the mesh 'sequence' axis, K/V rotated via ppermute (differentiable
    # — usable in training); the rest stays GSPMD. pallas_qk8 = inference-
    # only int8 QK^T + bf16 PV; pallas_int8 = inference-only full-int8
    # kernel — both for W8A8 serving.
    attention_impl: str = "auto"
    # rope rotation dtype: "float32" = reference-faithful (diffusers
    # apply_rotary_emb upcasts); "bfloat16" keeps the rotation + tables in
    # bf16 — saves repeated f32 table traffic inside the block scans
    rope_dtype: str = "float32"
    # False = unroll the dual/single block loops instead of lax.scan over
    # stacked params (serving experiment: the scan's per-layer dynamic
    # slices showed up as a dominant `copy` bucket in the W8A8 step profile;
    # unrolled blocks read weights via static slices XLA can fuse). Params
    # stay in the stacked layout either way. Training keeps scan (per-layer
    # gating, smaller graphs).
    scan_blocks: bool = True
    # lax.scan unroll factor for the block scans (scan_blocks=True only).
    # >1 replicates k block bodies per scan iteration, letting XLA overlap
    # layer i+1's stacked-param dynamic-slice/dequant with layer i's compute
    # — the middle ground between scan (u1) and full unrolling on the
    # copy-dominated W8A8 profile, at ~k x body compile cost.
    scan_unroll: int = 1
    # fused Pallas ln+modulate+quant block prologue for W8A8 serving
    # (VERDICT r4 #2: one HBM pass instead of the XLA ln/mod/absmax/quant
    # chain). "env" = consult GIE_FUSE_MOD_QUANT at trace time (default
    # off); "on" | "off" | "interpret" (tests) are explicit — use those
    # under jitted pipelines (denoise_scan keys its compile cache on this
    # config, so an env flip alone would silently reuse the old program).
    fuse_mod_quant: str = "env"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_dim(self) -> int:
        return int(self.inner_dim * self.mlp_ratio)

    @classmethod
    def tiny(cls) -> "FluxConfig":
        """Small config for tests: same topology, toy widths."""
        return cls(
            in_channels=16,
            out_channels=16,
            num_layers=2,
            num_single_layers=3,
            attention_head_dim=32,
            num_attention_heads=4,
            joint_attention_dim=64,
            pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12),
        )
