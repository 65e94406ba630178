"""Small utilities mirroring videosys/utils/utils.py behaviors."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int, dp_rank: Optional[int] = None) -> jax.Array:
    """Seed -> jax PRNG key, with the reference's per-dp-rank offset
    (``videosys/utils/utils.py:19-34``: each data-parallel rank gets
    ``seed + dp_rank`` so replicas sample different noise)."""
    if dp_rank is not None:
        seed = seed + dp_rank
    return jax.random.PRNGKey(seed)


def str_to_dtype(name: str):
    return {"fp32": jnp.float32, "float32": jnp.float32,
            "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            "fp16": jnp.float16, "float16": jnp.float16}[name]


def to_uint8_video(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float frames -> uint8 (the reference's normalize+clamp,
    ``pipeline_open_sora.py:645-648``)."""
    x = np.clip((np.asarray(x, np.float32) + 1.0) * 127.5, 0, 255)
    return x.astype(np.uint8)


def save_video(video: np.ndarray, path: str, fps: int = 16) -> str:
    """Save [T, H, W, 3] frames. Uses imageio when available, else .npy
    (zero-egress image: codecs may be absent)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if video.dtype != np.uint8:
        video = to_uint8_video(video)
    try:
        import imageio
        imageio.mimwrite(path, list(video), fps=fps)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, video)
        return alt


def save_image(img: np.ndarray, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if img.dtype != np.uint8:
        img = to_uint8_video(img[None])[0]
    try:
        import imageio
        imageio.imwrite(path, img)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, img)
        return alt


# Reference save-fps table, shared by the CLI saver and the HTTP server
# (Wan magcache_generate.py:806-812 save_video fps=cfg.sample_fps 16 /
# ti2v 24; hyvideo save_videos_grid fps=24; FramePack save_bcthw_as_mp4
# fps=30; videosys save_video: cogvideox/latte/vchitect 8,
# open-sora(-plan) 24). Longest-prefix-free ordered table; first match wins.
_TASK_FPS = (("ti2v", 24), ("hunyuan", 24), ("framepack", 30),
             ("cogvideox", 8), ("latte", 8), ("vchitect", 8),
             ("open-sora", 24))


def task_fps(task: str) -> int:
    """Frames-per-second the reference CLIs save each task's videos at."""
    return next((v for k, v in _TASK_FPS if task.startswith(k)), 16)
