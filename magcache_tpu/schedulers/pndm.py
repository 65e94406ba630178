"""PNDM (PLMS) schedule — Open-Sora-Plan v1.1.0's sampler.

The reference's OSP pipeline uses diffusers' ``PNDMScheduler`` for v110
(``videosys/pipelines/open_sora_plan/pipeline_open_sora_plan.py:302-306``)
with ``skip_prk_steps`` semantics: step 0 applies the plain transfer on the
raw epsilon; later steps apply it on an Adams-Bashforth combination of the
epsilon history::

    step 1:  e' = (3 e_t - e_{t-1}) / 2
    step 2:  e' = (23 e_t - 16 e_{t-1} + 5 e_{t-2}) / 12
    step >=3: e' = (55 e_t - 59 e_{t-1} + 37 e_{t-2} - 9 e_{t-3}) / 24

with the DDIM-form prev-sample transfer (``_get_prev_sample``)::

    x_prev = (abar_prev/abar_t)^0.5 * x - (abar_prev - abar_t) /
             (abar_t^0.5 * ((1-abar_prev)^0.5 + (abar_prev(1-abar_t)/abar_t)^0.5)) * e'

Everything is host-precomputed into per-step (c_x, c_e) pairs plus the
[n, 4] epsilon-history weight table, so the device loop is one scan.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["PNDMSchedule"]

_AB_WEIGHTS = {
    0: (1.0, 0.0, 0.0, 0.0),
    1: (1.5, -0.5, 0.0, 0.0),
    2: (23 / 12, -16 / 12, 5 / 12, 0.0),
}
_AB4 = (55 / 24, -59 / 24, 37 / 24, -9 / 24)


@dataclasses.dataclass(frozen=True)
class PNDMSchedule:
    timesteps: np.ndarray    # f32[n]
    c_x: np.ndarray          # f32[n]
    c_e: np.ndarray          # f32[n]
    eps_weights: np.ndarray  # f32[n, 4]: weight of e_t, e_{t-1}, ...

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @staticmethod
    def create(num_steps: int, *, train_steps: int = 1000,
               beta_start: float = 0.0001, beta_end: float = 0.02,
               beta_schedule: str = "scaled_linear") -> "PNDMSchedule":
        if beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, train_steps,
                                dtype=np.float64)
        elif beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                train_steps, dtype=np.float64) ** 2
        else:
            raise ValueError(beta_schedule)
        abar = np.cumprod(1.0 - betas)

        # diffusers "leading" spacing: arange(n) * (train//n), reversed
        ratio = train_steps // num_steps
        ts = (np.arange(num_steps) * ratio).round()[::-1].astype(int)

        c_x = np.zeros(num_steps)
        c_e = np.zeros(num_steps)
        w = np.zeros((num_steps, 4))
        for i, t in enumerate(ts):
            t_prev = t - ratio
            a_t = abar[t]
            a_prev = abar[t_prev] if t_prev >= 0 else 1.0
            c_x[i] = np.sqrt(a_prev / a_t)
            denom = np.sqrt(a_t) * (np.sqrt(1 - a_prev)
                                    + np.sqrt(a_prev * (1 - a_t) / a_t))
            c_e[i] = -(a_prev - a_t) / denom
            w[i] = _AB_WEIGHTS.get(i, _AB4)
        return PNDMSchedule(timesteps=ts.astype(np.float32),
                            c_x=c_x.astype(np.float32),
                            c_e=c_e.astype(np.float32),
                            eps_weights=w.astype(np.float32))
