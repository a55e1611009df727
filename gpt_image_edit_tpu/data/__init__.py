from gpt_image_edit_tpu.data.constants import SPECIAL_TOKENS, GENERATE_TOKEN
from gpt_image_edit_tpu.data.image_processing import (
    smart_resize,
    preprocess_vit_patches,
    preprocess_vae_image,
)


def _dataset_types():
    """DATASET_TYPE registry (ref:univa/dataset/__init__.py:4-8)."""
    from gpt_image_edit_tpu.data.dataset import EditDataset
    from gpt_image_edit_tpu.data.llava_dataset import LlavaDataset

    return {
        "qwen2vl": EditDataset,
        "qwen2p5vl": EditDataset,
        "llava": LlavaDataset,
    }


def get_dataset_cls(dataset_type: str):
    return _dataset_types()[dataset_type]
