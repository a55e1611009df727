#!/usr/bin/env python
"""Training entry point: `python train_denoiser.py <config.yaml> [key=value ...]`

Mirrors the reference's single-positional-YAML CLI
(ref:train_denoiser.py:1621-1633) with dotted-key overrides instead of
OmegaConf, e.g.:

  python train_denoiser.py configs/stage1_512.yaml \
      training_config.max_train_steps=100 dataset_config.random_data=true
"""

import logging
import sys

import yaml

from gpt_image_edit_tpu.training.config import load_config
from gpt_image_edit_tpu.training.trainer import train


def _parse_overrides(args):
    out = {}
    for a in args:
        k, _, v = a.partition("=")
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(v)
    return out


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env, enable_compile_cache
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    enable_compile_cache()  # warm restarts: persist XLA executables
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    # Multi-host coordination must happen before ANY other jax use
    # (the NCCL init analogue, ref:train_denoiser.py:324 Accelerator()).
    from gpt_image_edit_tpu.parallel.distributed import initialize

    initialize()
    yaml_path = None
    rest = sys.argv[1:]
    if rest and "=" not in rest[0]:
        yaml_path, rest = rest[0], rest[1:]
    cfg = load_config(yaml_path, _parse_overrides(rest))
    metrics = train(cfg)
    print(metrics)


if __name__ == "__main__":
    main()
