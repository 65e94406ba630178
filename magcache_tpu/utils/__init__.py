from magcache_tpu.utils.misc import save_video, set_seed, str_to_dtype  # noqa: F401
from magcache_tpu.utils.logging import get_logger  # noqa: F401
