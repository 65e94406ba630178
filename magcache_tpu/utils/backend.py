"""Backend-init guard for benchmark entry points.

The axon TPU tunnel can wedge: `jax.devices()` then blocks inside a C call
(observed 25 min before surfacing UNAVAILABLE), which Python signal handlers
cannot interrupt. Probe device init in a subprocess with a hard timeout
first, then initialize in-process only on success.
"""

from __future__ import annotations

import sys


def init_backend_or_die(timeout_s: int = 300, log=None):
    """Return `jax.devices()`, or exit(2) with a diagnostic when the backend
    probe fails or exceeds ``timeout_s``. CPU-forced runs skip the probe
    (CPU init is instant and a second process is harmless there anyway)."""
    import subprocess

    import jax

    if log is None:
        def log(*a):
            print(*a, file=sys.stderr, flush=True)

    plat = jax.config.jax_platforms
    if plat and plat.split(",")[0] == "cpu":
        return jax.devices()        # CPU-forced run: init is instant
    code = "import jax; print(jax.devices())"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log(f"FATAL: jax backend init probe exceeded {timeout_s}s "
            "(TPU tunnel down?)")
        sys.exit(2)
    if r.returncode != 0:
        log(f"FATAL: jax backend init probe failed:\n{r.stderr[-2000:]}")
        sys.exit(2)
    return jax.devices()
