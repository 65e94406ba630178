"""Flow-matching UniPC multistep solver (predictor-corrector, bh2).

Wan 2.1/2.2 sample with a flow-matching UniPC scheduler (the reference CLI's
``--sample_solver unipc``). This is a from-scratch implementation of the UniPC
algorithm (Zhao et al., arXiv:2302.04867) specialized to the rectified-flow
parameterization used by Wan:

  x_sigma = (1 - sigma) x0 + sigma eps,   alpha = 1 - sigma,
  lambda = log(alpha / sigma),            model predicts velocity v = eps - x0,
  data prediction m = x - sigma v.

Per step i -> i+1 (data-prediction form, h = lambda_{i+1} - lambda_i):

  predictor:  x_{i+1} = (sigma_{i+1}/sigma_i) x_i
                        - alpha_{i+1} (e^{-h} - 1) m_i
                        - alpha_{i+1} B(h) * sum_l rho_l D_l
  corrector:  same expansion including D_t = m_{i+1} - m_i with weights rho^c

where D_l = (m_{i-l} - m_i)/r_l, r_l = (lambda_{i-l} - lambda_i)/h, and the
rho coefficients solve the small Vandermonde system R rho = b with
b_p = (phi_{p+1}(-h) p!) / B(h), phi_1(z) = e^z - 1, phi_{k+1}(z) =
(phi_k(z) - 1/k!)/z; B(h) = e^{-h} - 1 for the bh2 variant.

TPU design: the sigma grid is static, so every R/b solve and all scalar
coefficients are computed **on the host** once; the device-side update inside
`lax.scan` is a fixed linear combination of carried model outputs — no control
flow, no solves, MXU-free VPU work that XLA fuses into the surrounding step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["UniPCSchedule"]


def _phis(h: float, kmax: int) -> list:
    """phi_1..phi_kmax evaluated at z = -h.

    phi_1(z) = (e^z - 1)/z;  phi_{k+1}(z) = (phi_k(z) - 1/k!)/z.
    (Verified against the exact integral form; see tests.)
    """
    z = -h
    phis = [math.expm1(z) / z]  # phi_1
    fact = 1.0
    for k in range(1, kmax):
        fact *= k
        phis.append((phis[-1] - 1.0 / fact) / z)
    return phis


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    """Precomputed UniPC coefficients over a FlowMatch sigma grid.

    Built from a `FlowMatchSchedule`; exposes per-step static coefficients so
    the sampler's scanned body is branch-free.
    """

    sigmas: np.ndarray          # f32[n+1]
    timesteps: np.ndarray       # f32[n]
    order: int = 2
    lower_order_final: bool = True
    use_corrector: bool = True
    num_train_timesteps: int = 1000
    # The corrector assumes m(lambda) is polynomial over the step; at the grid
    # ends (sigma ~ 1 or ~ 0) lambda jumps by ~10 due to clamping and that
    # assumption collapses, so the corrector is skipped for steps with h
    # larger than this (measured: enabling it there *degrades* accuracy).
    max_corrector_h: float = 3.0

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @staticmethod
    def create(num_steps: int, *, shift: float = 1.0, order: int = 2,
               use_corrector: bool = True, **kw) -> "UniPCSchedule":
        from magcache_tpu.schedulers.flow_match import FlowMatchSchedule

        base = FlowMatchSchedule.create(num_steps, shift=shift, **kw)
        return UniPCSchedule(base.sigmas, base.timesteps, order=order,
                             use_corrector=use_corrector)

    # ---- static scalar helpers ------------------------------------------
    def _lam(self, i: int) -> float:
        s = float(self.sigmas[i])
        s = min(max(s, 1e-6), 1.0 - 1e-6)
        return math.log((1.0 - s) / s)

    def _step_order(self, i: int) -> int:
        """Multistep warm-up and (optionally) wind-down, as in standard
        multistep schedulers: order ramps 1,2,...,order and is capped near the
        final steps when lower_order_final."""
        o = min(self.order, i + 1)
        if self.lower_order_final:
            o = min(o, self.num_steps - i)
        return max(1, o)

    def _rhos(self, i: int, order: int, corrector: bool) -> np.ndarray:
        """Solve the UniPC coefficient system at step i (host-side)."""
        h = self._lam(i + 1) - self._lam(i)
        rks = []
        for l in range(1, order):
            rks.append((self._lam(i - l) - self._lam(i)) / h)
        if corrector:
            rks.append(1.0)
        if not rks:
            return np.zeros((0,))
        k = len(rks)
        phis = _phis(h, k + 1)
        b_h = math.expm1(-h)  # bh2 variant: B(h) = e^{-h} - 1
        R = np.array([[r ** p for r in rks] for p in range(k)])
        # Matching the exact expansion x_t = (sigma_t/sigma_s) x_s +
        # alpha_t sum_k h^{k+1} phi_{k+1}(-h) m^(k):  sum_l rho_l r_l^{k-1} =
        # k! * (-h) * phi_{k+1}(-h) / B(h).
        b = np.array(
            [(-h) * phis[p + 1] * math.factorial(p + 1) / b_h for p in range(k)]
        )
        return np.linalg.solve(R, b)

    def predictor_coeffs(self, i: int):
        """Static (c_x, c_m0, rhos, prev_offsets) for the predictor at step i.

        x_{i+1} = c_x * x_i + c_m0 * m_i + alpha_{i+1} * (-B(h)) * sum rho_l D_l
        with D_l = (m_{i-off_l} - m_i) / r_l folded into the rho weights here:
        we return per-prev weights w_l and the m_i weight adjustment, so the
        device computes   x' = c_x x + c_m0 m0 + sum_l w_l m_prev_l.
        """
        order = self._step_order(i)
        h = self._lam(i + 1) - self._lam(i)
        s_next, s_cur = float(self.sigmas[i + 1]), float(self.sigmas[i])
        alpha_next = 1.0 - s_next
        c_x = s_next / max(s_cur, 1e-9)
        phi1 = math.expm1(-h)
        c_m0 = -alpha_next * phi1
        b_h = phi1
        w = []
        offsets = []
        if order > 1:
            rhos = self._rhos(i, order, corrector=False)
            for l in range(1, order):
                r_l = (self._lam(i - l) - self._lam(i)) / h
                w_l = -alpha_next * b_h * float(rhos[l - 1]) / r_l
                w.append(w_l)
                offsets.append(l)
                c_m0 -= w_l
        return c_x, c_m0, tuple(w), tuple(offsets)

    def corrector_coeffs(self, i: int):
        """Static coefficients for the corrector of step i-1 -> i, applied once
        the model output m_i at the predicted x_i is available.

        x_i^c = c_x x_{i-1} + c_m0 m_{i-1} + sum_l w_l m_prev + w_t m_i
        """
        j = i - 1  # the step being corrected
        order = self._step_order(j)
        h = self._lam(j + 1) - self._lam(j)
        s_next, s_cur = float(self.sigmas[j + 1]), float(self.sigmas[j])
        alpha_next = 1.0 - s_next
        c_x = s_next / max(s_cur, 1e-9)
        phi1 = math.expm1(-h)
        c_m0 = -alpha_next * phi1
        b_h = phi1
        rhos = self._rhos(j, order, corrector=True)
        w, offsets = [], []
        for l in range(1, order):
            r_l = (self._lam(j - l) - self._lam(j)) / h
            w_l = -alpha_next * b_h * float(rhos[l - 1]) / r_l
            w.append(w_l)
            offsets.append(l)
            c_m0 -= w_l
        w_t = -alpha_next * b_h * float(rhos[-1])  # D_t = m_i - m_{j}, r_t = 1
        c_m0 -= w_t
        return c_x, c_m0, tuple(w), tuple(offsets), w_t

    def corrector_ok(self, i: int) -> bool:
        """Whether the corrector should run at step i (correcting i-1 -> i)."""
        if not self.use_corrector or i == 0:
            return False
        h = self._lam(i) - self._lam(i - 1)
        return h <= self.max_corrector_h

    # ---- convenience host-loop sampler (used by tests & small models) ---
    def to_data_pred(self, x: jnp.ndarray, v: jnp.ndarray, i: int) -> jnp.ndarray:
        return x - float(self.sigmas[i]) * v.astype(x.dtype)
