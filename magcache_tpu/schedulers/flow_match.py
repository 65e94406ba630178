"""Flow-matching (rectified flow) schedules with shift, Euler update.

Covers the samplers used by Wan 2.1/2.2 (UniPC/DPM++ run on this same sigma
schedule; the Euler update is the first-order member), FLUX (dynamic
mu-shift), and Qwen-Image. Sigma construction follows the behavioral spec in
``MagCache4Wan2.2/magcache_generate.py:43-95`` (a clean reimplementation of
FlowMatch set_timesteps): linspace sigmas, static shift
``shift*s / (1 + (shift-1)*s)`` or dynamic (``exp(mu)``-based time shift),
terminal sigma appended, ``timesteps = sigmas * num_train_timesteps``.

All schedule math is host-side numpy (static per run); only the Euler update
runs on device inside the scanned loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["FlowMatchSchedule"]


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Precomputed sigma/timestep tables + the per-step state update.

    The model predicts the flow velocity v = dx/dsigma (x1 - x0 for rectified
    flow); Euler: ``x <- x + (sigma_next - sigma) * v``.
    """

    sigmas: np.ndarray      # f32[num_steps + 1], descending, terminal appended
    timesteps: np.ndarray   # f32[num_steps], what the model sees

    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @staticmethod
    def create(
        num_steps: int,
        *,
        shift: float = 1.0,
        mu: Optional[float] = None,
        sigma_max: float = 1.0,
        sigma_min: float = 0.0,
        num_train_timesteps: int = 1000,
        final_sigma_zero: bool = True,
        linspace_endpoint: bool = False,
    ) -> "FlowMatchSchedule":
        """Build the schedule.

        - Wan-style: ``linspace(sigma_max, sigma_min, n+1)[:-1]`` then static
          shift (``MagCache4Wan2.2/magcache_generate.py:72-79``).
        - FLUX-style: pass ``mu`` for dynamic ("resolution-dependent") shifting
          ``exp(mu) / (exp(mu) + (1/s - 1))``; diffusers computes mu from the
          image token count.
        """
        if linspace_endpoint:
            # diffusers FlowMatchEuler default: linspace(1, 1/n, n)
            sigmas = np.linspace(sigma_max, sigma_max / num_steps, num_steps)
        else:
            sigmas = np.linspace(sigma_max, sigma_min, num_steps + 1)[:-1]
        if mu is not None:
            sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
        elif shift != 1.0:
            sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        sigma_last = 0.0 if final_sigma_zero else float(sigmas[-1])
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
        timesteps = (sigmas[:-1] * num_train_timesteps).astype(np.float32)
        return FlowMatchSchedule(sigmas, timesteps, num_train_timesteps)

    @staticmethod
    def flux_mu(seq_len: int, base_len: int = 256, max_len: int = 4096,
                base_shift: float = 0.5, max_shift: float = 1.15) -> float:
        """FLUX's resolution-dependent mu: linear in image sequence length."""
        m = (max_shift - base_shift) / (max_len - base_len)
        return seq_len * m + (base_shift - base_len * m)

    def step(self, x: jnp.ndarray, v: jnp.ndarray, i) -> jnp.ndarray:
        """Euler update at step ``i`` (host int or traced scalar)."""
        sig = jnp.asarray(self.sigmas)
        dt = sig[i + 1] - sig[i]
        return x + dt.astype(x.dtype) * v.astype(x.dtype)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, i: int) -> jnp.ndarray:
        """Forward process at sigma_i: x = (1-sigma)*x0 + sigma*noise."""
        s = float(self.sigmas[i])
        return (1.0 - s) * x0 + s * noise

    def boundary_step(self, boundary: float) -> int:
        """Wan2.2 MoE expert switch: number of steps with t >= boundary*T
        (``MagCache4Wan2.2/magcache_generate.py:697``)."""
        return int((self.timesteps >= boundary * self.num_train_timesteps).sum())
