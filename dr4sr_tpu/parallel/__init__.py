from dr4sr_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    create_mesh,
    replicate,
    shard_batch,
)
