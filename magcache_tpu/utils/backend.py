"""Backend-init guard for benchmark entry points.

The axon TPU tunnel can wedge: `jax.devices()` then blocks inside a C call
(observed 25 min before surfacing UNAVAILABLE), which Python signal handlers
cannot interrupt. Probe device init in a subprocess with a hard timeout
first, then initialize in-process only on success.
"""

from __future__ import annotations

import sys


def probe_backend(timeout_s: int = 120, attempts: int = 3,
                  backoff_s: int = 30, log=None) -> bool:
    """Probe device init in a subprocess; True iff some attempt succeeds.

    Retries because the axon tunnel wedge is often transient (round 4's
    end-of-round snapshot hit a wedge that cleared later): up to ``attempts``
    probes of ``timeout_s`` each, sleeping ``backoff_s`` between failures.
    """
    import subprocess
    import time

    if log is None:
        def log(*a):
            print(*a, file=sys.stderr, flush=True)

    code = "import jax; print(jax.devices())"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0:
                return True
            log(f"backend probe attempt {i+1}/{attempts} failed:\n"
                f"{r.stderr[-1000:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {i+1}/{attempts} exceeded "
                f"{timeout_s}s (TPU tunnel down?)")
        if i + 1 < attempts:
            time.sleep(backoff_s)
    return False


def init_backend_or_die(timeout_s: int = 300, log=None):
    """Return `jax.devices()`, or exit(2) with a diagnostic when the backend
    probe fails or exceeds ``timeout_s``. CPU-forced runs skip the probe
    (CPU init is instant and a second process is harmless there anyway)."""
    import jax

    if log is None:
        def log(*a):
            print(*a, file=sys.stderr, flush=True)

    plat = jax.config.jax_platforms
    if plat and plat.split(",")[0] == "cpu":
        return jax.devices()        # CPU-forced run: init is instant
    if not probe_backend(timeout_s=min(timeout_s, 120), attempts=3, log=log):
        log("FATAL: jax backend init probe failed after retries "
            "(TPU tunnel down?)")
        sys.exit(2)
    return jax.devices()
