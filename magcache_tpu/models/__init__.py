from magcache_tpu.models import flux  # noqa: F401
