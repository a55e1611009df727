"""Generic resumable sharded sample generator (step-1 of every benchmark).

Mirrors the shape of ref:univa/eval/imgedit/step1_gen_samples.py: rank-strided
work list (:261), skip-existing resumability (:264-266), per-sample anyres
output sizing, PNG outputs keyed by sample id. Works for imgedit / gedit /
complex-edit / omnicontext given a sample iterator."""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, Iterable, List, Optional

from PIL import Image

from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

log = logging.getLogger("gie_tpu.eval")


def generate_samples(
    cfg: EvalConfig,
    samples: List[Dict],
    *,
    runtime: Optional[UnivaRuntime] = None,
    key_fn: Callable[[Dict], str] = lambda s: s["key"],
    prompt_fn: Callable[[Dict], str] = lambda s: s["prompt"],
    image_fn: Callable[[Dict, EvalConfig], Optional[Image.Image]] = None,
) -> List[str]:
    """Generate PNGs for this rank's shard. Returns written paths."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    if runtime is None:
        runtime = UnivaRuntime(
            cfg.pretrained_lvlm_name_or_path or None,
            cfg.pretrained_denoiser_name_or_path or None,
            tiny=cfg.tiny,
            seed=cfg.seed,
            quantize=cfg.quantize,
            quantize_vlm=cfg.quantize_vlm,
            vae_dtype=cfg.vae_dtype,
        )

    shard = samples[cfg.rank :: cfg.world_size]
    written: List[str] = []

    def _write(out_path: str, img: Image.Image) -> None:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        img.save(out_path)
        written.append(out_path)
        log.info("wrote %s", out_path)

    def _req(prompt: str, image) -> dict:
        return {
            "instruction": prompt,
            "image": image,
            "steps": cfg.num_inference_steps,
            "guidance": cfg.guidance_scale,
            "seed": cfg.seed,
        }

    # batch_size > 1 (beyond ref): CONSECUTIVE same-shape samples run as one
    # batched scan via runtime.edit_batch — benchmark sets are mostly
    # shape-homogeneous, so consecutive grouping captures the win while
    # holding at most batch_size images in memory. Identical outputs: each
    # request's noise comes from cfg.seed exactly as the serial path draws it.
    bsz = max(1, int(getattr(cfg, "batch_size", 1) or 1))
    pending: List = []  # [(out_path, request, shape_key)]

    def _flush() -> None:
        if not pending:
            return
        items, reqs = [p[:2] for p in pending], [p[1] for p in pending]
        try:
            outs = (
                runtime.edit_batch([dict(r) for r in reqs])
                if len(reqs) > 1 else [runtime.edit(**reqs[0])]
            )
        except Exception as e:  # noqa: BLE001 — degrade, don't lose the run
            log.warning("batch of %d failed (%s); running serially",
                        len(reqs), e)
            # per-item isolation like the batch_size=1 path: one bad
            # sample must not abort the shard (or wedge every resume)
            outs = []
            for (out_path, _), r in zip(items, reqs):
                try:
                    outs.append(runtime.edit(**r))
                except Exception:  # noqa: BLE001
                    log.exception("sample %s failed; continuing", out_path)
                    outs.append(None)
        for (out_path, _), img in zip(items, outs):
            if img is not None:
                _write(out_path, img)
        pending.clear()

    for s in shard:
        key = key_fn(s)
        out_path = os.path.join(cfg.output_dir, f"{key}.png")
        if os.path.exists(out_path):  # resumable
            continue
        image = image_fn(s, cfg) if image_fn else None
        req = _req(prompt_fn(s), image)
        shape_fn = getattr(runtime, "batch_shape_key", None)
        if bsz == 1 or not hasattr(runtime, "edit_batch") or shape_fn is None:
            try:
                _write(out_path, runtime.edit(**req))
            except Exception:
                log.exception("sample %s failed; continuing", key)
            continue
        shape_key = shape_fn(image)
        if pending and (pending[-1][2] != shape_key or len(pending) >= bsz):
            _flush()
        pending.append((out_path, req, shape_key))
    _flush()
    return written


def load_json(path: str):
    with open(path) as f:
        return json.load(f)
