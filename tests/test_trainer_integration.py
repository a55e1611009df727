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


def test_train_quantized_frozen(tmp_path):
    """int8 weight-only FROZEN subtree (the 16GB-chip memory lever,
    VERDICT r1 #10): training still runs, loss finite, metrics.jsonl written."""
    cfg = _cfg(tmp_path, model_config={
        "tiny": True, "with_tune_mlp2": True, "quantize_frozen": True,
    })
    metrics = train(cfg)
    assert metrics["final_step"] == 2
    assert np.isfinite(metrics["loss"])
    import json
    import os

    mpath = os.path.join(str(tmp_path / "ckpt"), "metrics.jsonl")
    rows = [json.loads(l) for l in open(mpath)]
    assert len(rows) >= 2 and "lr" in rows[0] and "train_loss" in rows[0]


def test_train_int4_frozen(tmp_path):
    """quantize_frozen='int4': packed 4-bit frozen subtree (quarter HBM);
    grads flow through the dequantized matmuls, loss finite."""
    cfg = _cfg(tmp_path, model_config={
        "tiny": True, "with_tune_mlp2": True, "quantize_frozen": "int4",
    })
    metrics = train(cfg)
    assert metrics["final_step"] == 2
    assert np.isfinite(metrics["loss"])


def test_train_ema_validation_and_export(tmp_path):
    """EMA maintained, validated-with, and exported HF-format
    (ref:train_denoiser.py:489-509 model_ema save hook)."""
    cfg = _cfg(tmp_path, training_config={
        "output_dir": str(tmp_path / "ckpt"),
        "max_train_steps": 2,
        "checkpointing_steps": 2,
        "validation_steps": 2,
        "ema_decay": 0.99,
        "validation_with_ema": True,
        "export_ema_hf": True,
    })
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"])
    import glob
    import os

    ema_dir = os.path.join(str(tmp_path / "ckpt"), "model_ema")
    assert glob.glob(os.path.join(ema_dir, "*.safetensors")), "EMA HF export missing"
    probes = glob.glob(os.path.join(str(tmp_path / "ckpt"), "validation", "*", "*.png"))
    assert probes, "validation probe images missing"


def test_config_probe_slots_convert(tmp_path):
    """Reference-style validation_*_prompt/path slots fold into
    validation_probes (ref:configuration_denoise.py:77-117)."""
    cfg = load_config(None, {
        "dataset_config": {
            "random_data": True,
            "validation_it2i_prompt": "edit it",
            "validation_image_path": "/x.png",
            "validation_t2i_prompt": "a cat",
            "validation_iit2i_prompt": "merge",
            "validation_iit2i_path": ["/a.png", "/b.png"],
        },
    })
    probes = {p["name"]: p for p in cfg.dataset_config.validation_probes}
    assert probes["it2i"]["image_path"] == "/x.png"
    assert "image_path" not in probes["t2i"]
    assert probes["iit2i"]["image_paths"] == ["/a.png", "/b.png"]


def test_train_context_parallel(tmp_path):
    """model_config.attention_impl='ring' + a 4-axis mesh: the FLUX joint
    sequence trains sharded over the 'sequence' axis (context parallelism)."""
    cfg = _cfg(
        tmp_path,
        model_config={
            "tiny": True, "with_tune_mlp2": True, "attention_impl": "ring",
        },
        parallel_config={"mesh_shape": [1, 2, 2, 2]},
    )
    metrics = train(cfg)
    assert metrics["final_step"] == 2
    assert np.isfinite(metrics["loss"])


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-run: the in-flight step finishes, a checkpoint is written
    even off the periodic schedule, train() returns cleanly, and
    resume_from_checkpoint continues from the preempted step."""
    from gpt_image_edit_tpu.training.preemption import PreemptionGuard

    guard = PreemptionGuard()
    guard.request_stop()  # "signal" arrives before step 1 completes
    cfg = _cfg(tmp_path, training_config={
        "output_dir": str(tmp_path / "ckpt"),
        "max_train_steps": 5, "checkpointing_steps": 50,
        "validation_steps": 0, "logging_steps": 1, "mask_weight_type": "log",
    })
    metrics = train(cfg, preemption_guard=guard)
    assert metrics["preempted_at"] == 1
    assert metrics["final_step"] == 1

    cfg2 = _cfg(tmp_path, training_config={
        "output_dir": str(tmp_path / "ckpt"),
        "max_train_steps": 2, "checkpointing_steps": 50,
        "resume_from_checkpoint": "latest",
        "validation_steps": 0, "logging_steps": 1, "mask_weight_type": "log",
    })
    metrics2 = train(cfg2)
    assert metrics2["final_step"] == 2
    assert np.isfinite(metrics2["loss"])
