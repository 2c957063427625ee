from text_to_image_tpu.parallel.mesh import (  # noqa: F401
    MeshEnv,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_sharding,
)
