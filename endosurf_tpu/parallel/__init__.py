from endosurf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    ray_sharding,
    replicated_sharding,
    shard_ray_batch,
)
