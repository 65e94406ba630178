"""DPM-Solver++ (2M) for flow-matching sigmas, as host-precomputed per-step
coefficients.

The OmniGen2 reference exposes ``--scheduler dpmsolver++`` via an external
``omnigen2.schedulers.scheduling_dpmsolver_multistep`` (a flow-matching
adaptation of diffusers' DPMSolverMultistepScheduler, ``inference.py:220-228``;
the module itself is not vendored in the MagCache repo). This is the standard
data-prediction multistep update on rectified-flow sigmas:

With alpha = 1 - sigma, lambda = log(alpha/sigma), and the model's velocity
``v`` giving the data prediction ``x0 = x - sigma * v``:

    step i (sigma_t -> sigma_s), h_i = lambda_s - lambda_t:
      first order:   x <- (sigma_s/sigma_t) x - alpha_s (e^{-h_i} - 1) x0_i
      second order:  same with D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}
                     in place of x0_i, r_i = h_{i-1} / h_i

Everything reduces to four per-step scalars consumed by the scan:
  c_x = sigma_s/sigma_t
  c_d = alpha_s - sigma_s * alpha_t / sigma_t      (= -alpha_s (e^{-h}-1))
  a   = 1 + 1/(2 r)          (x0_i weight;   1 on first/last step)
  b   = -1/(2 r)             (x0_{i-1} weight; 0 on first/last step)

The final step to sigma = 0 runs first-order (diffusers'
``lower_order_final``), where c_x = 0 and c_d = 1 recover x = x0 exactly.
sigma_0 = 1 (alpha_0 = 0) makes h_0 infinite; the first two steps then run
first-order, matching the diffusers schedule behavior.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["dpmpp_2m_flow_coeffs"]


def dpmpp_2m_flow_coeffs(sigmas: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-step DPM++(2M) coefficients for a flow sigma ladder.

    ``sigmas``: [n+1] decreasing, sigma_n may be 0. Returns arrays of length
    n: ``sigma_t`` (the current sigma, for x0 = x - sigma*v), ``a``, ``b``,
    ``c_x``, ``c_d``.
    """
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    alpha = 1.0 - sig
    with np.errstate(divide="ignore"):
        lam = np.log(alpha) - np.log(sig)      # +-inf at sigma = 0 / 1
    h = lam[1:] - lam[:-1]                     # [n]
    c_x = sig[1:] / sig[:-1]
    c_d = alpha[1:] - sig[1:] * alpha[:-1] / sig[:-1]
    a = np.ones(n)
    b = np.zeros(n)
    for i in range(1, n):
        hi, hp = h[i], h[i - 1]
        if not np.isfinite(hi) or not np.isfinite(hp) or hi == 0.0:
            continue                           # degrade to first order
        if i == n - 1 and sig[-1] == 0.0:
            continue                           # lower_order_final
        r = hp / hi
        a[i] = 1.0 + 1.0 / (2.0 * r)
        b[i] = -1.0 / (2.0 * r)
    return {
        "sigma_t": sig[:-1].astype(np.float32),
        "a": a.astype(np.float32),
        "b": b.astype(np.float32),
        "c_x": c_x.astype(np.float32),
        "c_d": c_d.astype(np.float32),
    }
