"""gpt_image_edit_tpu — TPU-native (JAX/XLA/Pallas) instruction-based image editing.

A ground-up re-design of the capabilities of wyhlovecpp/GPT-Image-Edit
(UniWorld/UniVA lineage: Qwen2.5-VL encoder -> MLP2 connector -> FLUX.1-Kontext
rectified-flow MMDiT -> FLUX VAE) for TPU hardware:

- pure-functional models (param pytrees + apply fns), bf16 compute / fp32 master
- SPMD via `jax.sharding.Mesh` with (data, fsdp, tensor) axes
- `lax.scan`-compiled flow-matching sampler (one XLA graph for all 28 steps)
- Pallas flash-attention kernels for the LM / MMDiT hot paths

Reference behavior citations use `ref:<path>:<line>` pointing into the upstream
repo (mounted at /root/reference during development).
"""

__version__ = "0.1.0"
