from gpt_image_edit_tpu.data.constants import SPECIAL_TOKENS, GENERATE_TOKEN
from gpt_image_edit_tpu.data.image_processing import (
    smart_resize,
    preprocess_vit_patches,
    preprocess_vae_image,
)
