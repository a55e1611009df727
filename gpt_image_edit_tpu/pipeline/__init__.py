from gpt_image_edit_tpu.pipeline.scheduler import (
    calculate_shift,
    flow_sigmas,
    shift_sigmas,
)
from gpt_image_edit_tpu.pipeline.kontext import KontextPipeline, PREFERRED_KONTEXT_RESOLUTIONS
