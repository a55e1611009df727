from gpt_image_edit_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_FSDP,
    AXIS_TENSOR,
    AXIS_SEQUENCE,
    BATCH_AXES,
    build_mesh,
    mesh_shape_for,
)
from gpt_image_edit_tpu.parallel.sharding import (
    shard_params,
    param_shardings,
    batch_sharding,
)
