"""Published calibration artifacts (magnitude-ratio curves) from the reference repo.

Each entry in ``calibrated_ratios.json`` carries its provenance as
``source: file:line`` into Zehong-Ma/MagCache. These are numeric calibration
data — the reference hard-codes them per model/resolution/task and users are
expected to recalibrate for new settings (``MagCache4Wan2.1/magcache_generate.py:907-912``).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np

_HERE = os.path.dirname(__file__)


@lru_cache(maxsize=1)
def _load() -> dict:
    with open(os.path.join(_HERE, "calibrated_ratios.json")) as f:
        return json.load(f)


def available_ratio_keys() -> list[str]:
    return sorted(_load().keys())


def get_calibrated_ratios(key: str, *, padded: bool = False) -> np.ndarray:
    """Return the calibrated ratio array for ``key``.

    With ``padded=True``, prepends the reference's ``[1.0] * pad`` first-step
    padding (``magcache_generate.py:908``: "the [1.0]*1 is the padding value of
    first magnitude ratio").  The ``opensora-v1.2`` entry is stored raw and the
    reference applies ``**0.5`` smoothing (``experiments/opensora.py:433``),
    which we apply here too.
    """
    entry = _load()[key]
    ratios = np.asarray(entry["ratios"], dtype=np.float64)
    if entry.get("sqrt"):
        ratios = ratios ** 0.5
    if padded and entry.get("pad"):
        ratios = np.concatenate([np.ones(entry["pad"]), ratios])
    return ratios


def ratio_pad(key: str) -> int:
    return int(_load()[key].get("pad") or 0)
