#!/usr/bin/env python
"""Attribute the offloaded-serving non-scan overhead (SERVING_r05: ~18s of
the ~40.8s per-request occupancy is not the 22.5s denoise scan): run ONE
full offloaded 1024^2 edit in-process with synthetic full-size weights and
print per-phase wall time plus the ComponentStore staging timers
(utils/offload.py stage_seconds) — how much is host->HBM restaging traffic
(vlm/t5/clip/flux/vae) vs compute (prefill, T5, scan, VAE).

Run on the TPU (the CPU path exercises the plumbing with tiny weights).
Logs an `offload_breakdown` row to bench_experiments.jsonl on TPU.

Usage: python scripts/offload_breakdown.py [--steps 28] [--size 1024]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--edits", type=int, default=2,
                    help="2nd edit separates compile+first-staging from "
                    "steady-state restaging")
    args = ap.parse_args()

    from gpt_image_edit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    from PIL import Image

    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", file=sys.stderr)

    if on_tpu:
        rt = UnivaRuntime(
            synthetic_full=True, offload=True, quantize="w8a8",
            quantize_vlm="int8", joint_with_t5=True,
        )
        size, steps = args.size, args.steps
    else:  # CPU smoke: tiny weights, same offload plumbing
        rt = UnivaRuntime(tiny=True, offload=True)
        size, steps = 64, 2

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (size, size, 3),
                                          dtype=np.uint8)
    )

    rows = []
    for i in range(args.edits):
        before = {k: v["s"] for k, v in rt.stage_timings().items()}
        t0 = time.perf_counter()
        rt.edit("make the sky dramatic", img, steps=steps,
                height=size, width=size, seed=7)
        t_edit = time.perf_counter() - t0
        after = rt.stage_timings()
        delta = {
            k: round(v["s"] - before.get(k, 0.0), 3)
            for k, v in after.items()
            if v["s"] - before.get(k, 0.0) > 1e-3
        }
        t_stage = sum(delta.values())
        rows.append((t_edit, t_stage, delta))
        print(f"edit {i}: {t_edit:.1f}s wall, {t_stage:.1f}s staging "
              f"{delta}, {t_edit - t_stage:.1f}s compute+host",
              file=sys.stderr)

    if on_tpu:
        import bench

        t_edit, t_stage, delta = rows[-1]  # steady-state (post-compile) edit
        bench._log_experiment(
            "offload_breakdown", size=size, steps=steps,
            t_edit_s=round(t_edit, 2), t_stage_s=round(t_stage, 2),
            stage_s=delta, counts={k: v["n"] for k, v in
                                   rt.stage_timings().items()},
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
