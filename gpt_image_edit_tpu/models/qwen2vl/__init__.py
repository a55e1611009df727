from gpt_image_edit_tpu.models.qwen2vl.model import (
    Qwen2VLConfig,
    Vision2Config,
    init as init_qwen2vl,
    apply as apply_qwen2vl,
)
