"""Test harness config: run JAX on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices, which
exercises the same mesh/collective code paths XLA uses on ICI.
"""

import os

# Must be set before the first `import jax` anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin at interpreter
# start and force-sets jax_platforms; re-force CPU here (backends initialize
# lazily, so this wins as long as no jax.devices() call has happened yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------- tiering
# Compile-heavy tests are marked `slow` and excluded from the default run so
# plain `pytest -q` verifies the suite in minutes. The full bill:
#   pytest -q -m slow              # only the slow tier
#   MAGCACHE_RUN_SLOW=1 pytest -q  # everything
def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if config.getoption("-m") or os.environ.get("MAGCACHE_RUN_SLOW"):
        return
    skip = _pytest.mark.skip(
        reason="slow tier (run with -m slow or MAGCACHE_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
