"""Standard epsilon-prediction DDIM (diffusers ``DDIMScheduler``, eta=0).

The reference Latte pipeline samples with diffusers' plain DDIMScheduler
(``videosys/pipelines/latte/pipeline_latte.py:24,224-231``: linear betas
``beta_start=1e-4 .. beta_end=0.02`` — the defaults its config docstring
documents — eps prediction, ``variance_type="learned_range"``).  With eta=0
the learned-variance channels never enter the update (they are sliced off
before the scheduler step), so the deterministic DDIM step is a per-step
LINEAR combination of (x, eps):

    x0     = (x - sqrt(1-a_t) eps) / sqrt(a_t)
    x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps
           = sqrt(a_prev/a_t) x
             + (sqrt(1-a_prev) - sqrt(a_prev/a_t) sqrt(1-a_t)) eps

which rides ``sample_euler``'s host-precomputed ``(x_coeffs, dts)`` pair
exactly like the CogVideoX zero-SNR DDIM does.  ``clip_sample`` is False
(the Latte-1 / PixArt-lineage scheduler configs disable it; a clamp would
break the linear form).  Timestep spacing is diffusers' default "leading"
(``arange(steps) * (T // steps)``, descending) with an optional
``steps_offset``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["DDIMEpsSchedule"]


@dataclasses.dataclass(frozen=True)
class DDIMEpsSchedule:
    timesteps: np.ndarray          # i64[num_steps], descending
    alphas_cumprod: np.ndarray     # f64[T]
    num_train_timesteps: int = 1000
    final_alpha: float = 1.0       # set_alpha_to_one=True default

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @staticmethod
    def create(num_steps: int, *, num_train_timesteps: int = 1000,
               beta_start: float = 0.0001, beta_end: float = 0.02,
               beta_schedule: str = "linear", steps_offset: int = 0,
               set_alpha_to_one: bool = True) -> "DDIMEpsSchedule":
        if beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        elif beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        else:
            raise ValueError(f"unsupported beta_schedule {beta_schedule!r}")
        acp = np.cumprod(1.0 - betas)
        step = num_train_timesteps // num_steps
        ts = ((np.arange(0, num_steps) * step).round()[::-1]
              .astype(np.int64)) + steps_offset
        final_alpha = 1.0 if set_alpha_to_one else float(acp[0])
        return DDIMEpsSchedule(ts, acp, num_train_timesteps, final_alpha)

    def step_arrays(self):
        """(c_x, c_eps) f32[num_steps]: ``x_prev = c_x * x + c_eps * eps``."""
        n = self.num_steps
        c_x = np.zeros(n)
        c_e = np.zeros(n)
        for i in range(n):
            a_t = float(self.alphas_cumprod[int(self.timesteps[i])])
            if i + 1 < n:
                a_prev = float(self.alphas_cumprod[int(self.timesteps[i + 1])])
            else:
                a_prev = self.final_alpha
            r = np.sqrt(a_prev / a_t)
            c_x[i] = r
            c_e[i] = np.sqrt(1 - a_prev) - r * np.sqrt(1 - a_t)
        return c_x.astype(np.float32), c_e.astype(np.float32)
