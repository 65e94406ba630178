from magcache_tpu.eval.metrics import lpips_distance, psnr, ssim  # noqa: F401
from magcache_tpu.eval.compare import compare_videos, compare_dirs  # noqa: F401
from magcache_tpu.eval.vbench import aggregate_vbench  # noqa: F401
