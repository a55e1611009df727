from gpt_image_edit_tpu.ops.norms import rms_norm, layer_norm, modulate
from gpt_image_edit_tpu.ops.packing import (
    pack_latents,
    unpack_latents,
    latent_image_ids,
)
from gpt_image_edit_tpu.ops.rope import (
    flux_rope_freqs,
    apply_rope_paired,
    mrope_freqs,
    apply_rope_halves,
)
from gpt_image_edit_tpu.ops.attention import dot_product_attention
