"""SD3 denoiser extension point (ref:univa/models/modeling_univa_denoise_tower.py:22-23,112-125).

The reference supports denoiser_type='sd3' but no shipped config uses it
(SURVEY.md appendix: vestigial). The registry entry exists so configs fail
with a clear message; the FLUX path is the production denoiser.

Implementation notes for when this is filled in:
- SD3 MMDiT = FLUX dual-stream blocks minus rope (learned pos embeds),
  with optional qk-norm and a final context drop; prefix_prompt_embeds are
  concatenated BEFORE the VLM embeds for sd3 (ref tower :113-117), the
  opposite of flux ordering.
- timestep conditioning has no guidance embedding.
"""

from __future__ import annotations

DENOISER_TYPE = {}


def register_denoiser(name):
    def _wrap(obj):
        DENOISER_TYPE[name] = obj
        return obj

    return _wrap


from gpt_image_edit_tpu.models import flux as _flux  # noqa: E402
from gpt_image_edit_tpu.models import sd3_model as _sd3  # noqa: E402

DENOISER_TYPE["flux"] = _flux
DENOISER_TYPE["sd3"] = _sd3
