"""Process-0-gated logging (the reference gates on rank 0,
``videosys/utils/logging.py:15-29``; in JAX single-controller terms that is
``jax.process_index() == 0``)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "magcache_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    try:
        import jax
        is_primary = jax.process_index() == 0
    except Exception:
        is_primary = True
    if is_primary:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "[%(asctime)s] %(levelname)s %(name)s: %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
