"""Trainer integration on the 8-device CPU mesh: smoke train via the real
config path, checkpoint save + resume-from-latest continues the step count."""

import jax
import numpy as np
import pytest

from gpt_image_edit_tpu.training.config import load_config
from gpt_image_edit_tpu.training.trainer import train


def _cfg(tmp_path, **over):
    overrides = {
        "training_config": {
            "output_dir": str(tmp_path / "ckpt"),
            "max_train_steps": 2,
            "learning_rate": 1e-3,
            "logging_steps": 1,
            "checkpointing_steps": 1,
            "validation_steps": 0,
            "mask_weight_type": "log",
            **over.pop("training_config", {}),
        },
        "model_config": {"tiny": True, "with_tune_mlp2": True},
        "dataset_config": {
            "random_data": True, "batch_size": 2, "height": 64, "width": 64,
            "min_pixels": 3136, "max_pixels": 3136, "num_workers": 2,
        },
    }
    overrides.update(over)
    return load_config(None, overrides)


def test_train_and_resume(tmp_path):
    cfg = _cfg(tmp_path)
    metrics = train(cfg)
    assert metrics["final_step"] == 2
    assert np.isfinite(metrics["loss"])

    # resume: latest checkpoint is step 2; continue to 3
    cfg2 = _cfg(
        tmp_path,
        training_config={
            "output_dir": str(tmp_path / "ckpt"),
            "max_train_steps": 3,
            "resume_from_checkpoint": "latest",
            "checkpointing_steps": 10,
            "validation_steps": 0,
        },
    )
    metrics2 = train(cfg2)
    assert metrics2["final_step"] == 3
    assert np.isfinite(metrics2["loss"])
