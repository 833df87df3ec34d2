from .mesh import batch_sharding, create_mesh, replicated, shard_batch  # noqa: F401
from .pipeline import (  # noqa: F401
    cait_pipeline_forward,
    mixer_pipeline_forward,
    pipeline_apply,
    pipeline_param_sharding,
    stack_block_params,
    unstack_block_params,
    vit_pipeline_forward,
    vit_pipeline_forward_stacked,
)
