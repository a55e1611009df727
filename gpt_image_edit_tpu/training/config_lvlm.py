"""LVLM pretrain-stage configuration (extension point).

Schema parity with ref:univa/training/configuration_lvlm.py:1-34 — the
reference ships this config for an LVLM-pretraining stage whose trainer is
not in the repo (vestigial per SURVEY appendix). The schema is kept loadable
here so a future understanding-pretrain stage slots in without a config
migration: same three sections and the same `from_dict` entry.

The reference's TrainingConfig subclasses HF TrainingArguments; the TPU
equivalent is a plain mapping passed through to our optimizer/trainer layer
(we do not depend on torch Trainer machinery), so unknown keys are preserved
rather than validated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict


@dataclasses.dataclass
class LvlmTrainingArguments:
    """ref TrainingConfig(TrainingArguments): an open bag of trainer args."""

    output_dir: str = "output"
    learning_rate: float = 1e-5
    num_train_epochs: float = 1.0
    per_device_train_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LvlmTrainingArguments":
        known = {f.name for f in dataclasses.fields(cls)} - {"extra"}
        kw = {k: v for k, v in d.items() if k in known}
        return cls(**kw, extra={k: v for k, v in d.items() if k not in known})


@dataclasses.dataclass
class LvlmDatasetConfig:
    """ref DatasetConfig (:11-12)."""

    data_txt: str


@dataclasses.dataclass
class LvlmModelConfig:
    """ref ModelConfig (:15-19)."""

    pretrained_model_path_or_name: str
    image_processor_path: str
    train_llm: bool = True
    train_lm_head: bool = True


@dataclasses.dataclass
class UnivaLvlmTrainingConfig:
    """ref UnivaTrainingConfig (:22-34)."""

    training_config: LvlmTrainingArguments
    dataset_config: LvlmDatasetConfig
    model_config: LvlmModelConfig

    @classmethod
    def from_dict(
        cls,
        training_config: Dict[str, Any],
        dataset_config: Dict[str, Any],
        model_config: Dict[str, Any],
    ) -> "UnivaLvlmTrainingConfig":
        return cls(
            training_config=LvlmTrainingArguments.from_dict(training_config),
            dataset_config=LvlmDatasetConfig(**dataset_config),
            model_config=LvlmModelConfig(**model_config),
        )
