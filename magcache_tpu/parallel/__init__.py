from magcache_tpu.parallel.mesh import (  # noqa: F401
    AXIS_DP,
    AXIS_SP,
    AXIS_TP,
    MeshPlan,
    activation_sharding,
    build_mesh,
    maybe_shard,
    shard_params,
    use_mesh,
)
