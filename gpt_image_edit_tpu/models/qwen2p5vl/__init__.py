from gpt_image_edit_tpu.models.qwen2p5vl.config import (
    Qwen2p5VLConfig,
    VisionConfig,
    TextConfig,
)
from gpt_image_edit_tpu.models.qwen2p5vl.model import (
    init as init_qwen,
    apply as apply_qwen,
)
