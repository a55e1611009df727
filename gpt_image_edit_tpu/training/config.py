"""Training config schema + YAML merge.

Mirrors the reference's OmegaConf dataclass schema
(ref:univa/training/configuration_denoise.py) minus torch-isms; loading is
`dataclass defaults <- YAML file` like ref:train_denoiser.py:1625-1631 but
with plain pyyaml (omegaconf isn't available / needed).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import yaml


@dataclasses.dataclass
class TrainingConfig:
    seed: int = 42
    output_dir: str = "./checkpoints/run"
    max_train_steps: int = 1000
    learning_rate: float = 1e-6
    optimizer: str = "adamw"            # adamw | adafactor
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    lr_scheduler: str = "constant"       # constant | cosine | linear
    lr_warmup_steps: int = 0
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"        # bf16 | fp32
    gradient_checkpointing: bool = False  # jax.remat on the block scans
    checkpointing_steps: int = 500
    checkpoints_total_limit: int = 3
    resume_from_checkpoint: Optional[str] = None  # "latest" | path
    validation_steps: int = 500
    logging_steps: int = 10
    # flow-matching
    discrete_timestep: bool = False
    weighting_scheme: str = "none"       # none | sigma_sqrt | logit_normal...
    sigmas_as_weight: bool = False
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mask_weight_type: Optional[str] = "log"   # log | exp | None
    drop_prompt_rate: float = 0.0
    drop_t5_rate: float = 1.0
    # EMA (ref:train_denoiser.py:258-313)
    ema_decay: Optional[float] = None
    ema_update_freq: int = 1
    ema_update_after_step: int = 0
    validation_with_ema: bool = False    # probe-generate with EMA weights
    # write an HF-format model_ema/ dir at each checkpoint, like the
    # reference's save-state pre-hook (ref:train_denoiser.py:489-509)
    export_ema_hf: bool = False
    profile_out_dir: Optional[str] = None
    report_to: Optional[str] = None      # wandb (gated) | None


@dataclasses.dataclass
class DatasetConfig:
    data_txt: str = ""
    batch_size: int = 1
    num_workers: int = 4
    height: int = 1024
    width: int = 1024
    padding_side: str = "left"
    min_pixels: int = 200704
    max_pixels: int = 200704
    max_seq_len: int = 2048            # LM token budget per sample (bucketed)
    anyres: str = "any_1ratio"
    ocr_enhancer: bool = False          # inject OCR phrases (ref:qwen2vl_dataset.py:531-548)
    use_step1x_preprocessing: bool = False  # quote-protecting tokenize (ref :32-255)
    random_data: bool = False           # synthetic smoke mode (ref:qwen2vl_dataset.py:393-459)
    notry: bool = False                 # surface dataset errors instead of resampling (ref :685-691)
    # Multi-resolution training: list of [h, w] buckets. Samples pick the
    # bucket closest to their target aspect and batches are built per-bucket
    # (the TPU answer to ref's hetero list-of-tensors, ref:train_denoiser.py:904-916).
    resolution_buckets: Optional[List[List[int]]] = None
    # Validation probes: list of {name, prompt, image_path | image_paths}.
    # Reference-style flat slots `validation_<NAME>_prompt` / `_path`
    # (ref:configuration_denoise.py:77-117) are converted at load time.
    validation_probes: Optional[List[dict]] = None


@dataclasses.dataclass
class ModelConfig:
    pretrained_lvlm_name_or_path: str = ""
    pretrained_denoiser_name_or_path: str = ""
    pretrained_mlp2_path: Optional[str] = None
    guidance_scale: float = 1.0
    only_tune_mlp2: bool = False
    with_tune_mlp2: bool = True
    only_tune_image_branch: bool = True
    flux_train_layer_idx: Optional[List[int]] = None
    joint_ref_feature: bool = True
    only_use_t5: bool = False
    vae_fp32: bool = True
    tiny: bool = False                  # use tiny configs (tests / smoke)
    compute_dtype: str = "bfloat16"
    # FLUX rope rotation dtype: float32 (reference-faithful) | bfloat16
    # (measured ~-8% step time at +0.17% rel err; standard for bf16 LLMs)
    rope_dtype: str = "float32"
    # FLUX attention dispatch (models/flux/config.py): "auto" | "xla" |
    # "pallas" | "ring". "ring" = context parallelism — train with the joint
    # sequence sharded over the mesh 'sequence' axis (mesh_shape 4th entry)
    attention_impl: str = "auto"
    # remat policy when gradient_checkpointing is on: "nothing" (minimum
    # memory, full re-forward) | "dots" (save matmul outputs; bwd recompute
    # is elementwise-only — spend spare HBM on MFU)
    remat_policy: str = "nothing"
    # Quantization of the FROZEN subtree (VLM trunk etc.): True or "int8" =
    # weight-only int8 (halves frozen-weight HBM so wider batches fit on
    # 16GB chips); "int4" = packed 4-bit with 64-group scales (quarter).
    # Gradients still flow through activations (dequant inside linear()).
    quantize_frozen: "bool | str" = False


@dataclasses.dataclass
class ParallelConfig:
    mesh_shape: Optional[Tuple[int, int, int]] = None  # (data, fsdp, tensor)


@dataclasses.dataclass
class TrainDenoiseConfig:
    training_config: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    dataset_config: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    model_config: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    parallel_config: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)


def _merge_dataclass(obj, overrides: dict):
    for k, v in overrides.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key: {type(obj).__name__}.{k}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge_dataclass(cur, v)
        else:
            setattr(obj, k, v)
    return obj


def _convert_validation_slots(dataset_cfg: dict) -> dict:
    """Fold reference-style `validation_<NAME>_prompt` / `validation_<NAME>_path`
    pairs (ref:configuration_denoise.py:77-117, 13+ named slots) into the
    generic `validation_probes` list so reference YAMLs load unchanged."""
    probes = list(dataset_cfg.get("validation_probes") or [])
    # `validation_image_path` is the reference's shared slot for it2i probes
    shared_path = dataset_cfg.pop("validation_image_path", None)
    names = set()
    for key in list(dataset_cfg):
        if key.startswith("validation_") and key.endswith("_prompt"):
            names.add(key[len("validation_"):-len("_prompt")])
    for name in sorted(names):
        prompt = dataset_cfg.pop(f"validation_{name}_prompt", None)
        path = dataset_cfg.pop(
            f"validation_{name}_path",
            dataset_cfg.pop(f"validation_{name}_image_path", None),
        )
        if path is None and name == "it2i":
            path = shared_path
        if prompt is None:
            continue
        probe = {"name": name, "prompt": prompt}
        if isinstance(path, (list, tuple)):
            probe["image_paths"] = list(path)
        elif path:
            probe["image_path"] = path
        probes.append(probe)
    if probes:
        dataset_cfg["validation_probes"] = probes
    return dataset_cfg


def load_config(yaml_path: Optional[str] = None, overrides: Optional[dict] = None) -> TrainDenoiseConfig:
    cfg = TrainDenoiseConfig()
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        if "dataset_config" in (data or {}):
            data["dataset_config"] = _convert_validation_slots(data["dataset_config"])
        _merge_dataclass(cfg, data)
    if overrides:
        if "dataset_config" in overrides:
            overrides["dataset_config"] = _convert_validation_slots(
                overrides["dataset_config"]
            )
        _merge_dataclass(cfg, overrides)
    return cfg
