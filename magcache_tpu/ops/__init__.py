from magcache_tpu.ops.attention import attention  # noqa: F401
from magcache_tpu.ops.norms import adaln_modulate, layer_norm, rms_norm  # noqa: F401
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d, rope_freqs_nd  # noqa: F401
