"""Standalone CLI wrapper for the Open-Sora headline benchmark.

Usage: python tools/bench_opensora.py   (run on the TPU; prints one JSON line)
BENCH_TINY=1 runs the tiny CPU smoke of the code path.

The measurement lives in ``magcache_tpu/eval/bench_opensora.py`` so the
driver-run ``bench.py`` can attach the same numbers to the round artifact.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")


def main():
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from magcache_tpu.eval.bench_opensora import run

    print(json.dumps(run(tiny=os.environ.get("BENCH_TINY") == "1")))


if __name__ == "__main__":
    main()
