"""Per-step training metrics (ref:train_denoiser.py:1357-1375).

The reference tracks loss / lr / Prodigy `d*lr` to wandb via accelerate
trackers every step. Here: an always-on JSONL file under output_dir
(`metrics.jsonl`, one object per logged step) plus wandb when installed and
`report_to: wandb` is configured.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

log = logging.getLogger("gie_tpu.metrics")


def prodigy_d(opt_state) -> Optional[float]:
    """Extract the Prodigy distance estimate `d` from a (possibly nested)
    optax state (ref:train_denoiser.py:1364-1373 logs d*lr diagnostics)."""
    from gpt_image_edit_tpu.training.prodigy import ProdigyState

    stack = [opt_state]
    while stack:
        s = stack.pop()
        if isinstance(s, ProdigyState):
            return float(s.d)
        if isinstance(s, tuple):
            stack.extend(s)
        elif hasattr(s, "inner_opt_state"):  # optax.MultiSteps
            stack.append(s.inner_opt_state)
    return None


class MetricsLogger:
    def __init__(self, output_dir: str, report_to: Optional[str] = None,
                 run_config: Optional[Dict[str, Any]] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self._wandb = None
        if report_to == "wandb":
            try:
                import wandb

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project="gpt_image_edit_tpu", config=run_config or {})
            except ImportError:
                log.warning("report_to=wandb but wandb is not installed; JSONL only")

    def log(self, step: int, values: Dict[str, Any]) -> None:
        rec = {"step": step, **{k: v for k, v in values.items() if v is not None}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.log(values, step=step)

    def close(self) -> None:
        self._file.close()
