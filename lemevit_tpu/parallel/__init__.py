from lemevit_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    build_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params,
)
