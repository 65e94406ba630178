from magcache_tpu.core.magcache import (  # noqa: F401
    MagCacheConfig,
    MagCacheState,
    compute_skip_schedule,
    dynamic_init,
    dynamic_update,
    nearest_interp,
    prepare_mag_ratios,
)
