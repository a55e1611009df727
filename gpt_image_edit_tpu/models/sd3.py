"""DENOISER_TYPE registry: flux | sd3
(ref:univa/models/modeling_univa_denoise_tower.py:22-23,112-125).

Both denoisers are IMPLEMENTED: the production FLUX MMDiT lives in
models/flux/ and the SD3 MMDiT (full implementation: image-first joint
attention, sincos pos embeds, context_pre_only final block) in
models/sd3_model.py, driven end-to-end by pipeline/sd3.py. The reference
supports denoiser_type='sd3' but ships no config using it (SURVEY appendix).

SD3-vs-FLUX protocol differences honored by the implementations:
- prefix_prompt_embeds concatenate BEFORE the VLM embeds for sd3
  (ref tower :113-117), the opposite of flux ordering
- learned/sincos positions instead of rope; no guidance embedding
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
