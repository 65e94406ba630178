"""RFLOW — the Open-Sora rectified-flow sampler, with timestep transform.

Behavioral spec from ``videosys/schedulers/scheduling_rflow_open_sora.py``:
- timesteps: ``t_i = (1 - i/n) * T`` (``:237``), optionally discretized;
- resolution/duration-aware transform ``t' = r*t / (1 + (r-1) t)`` with
  ``r = sqrt(HW / 512^2) * sqrt((frames//17*5) / 1) * scale`` (``:47-70``);
- Euler update ``z += v * dt / T`` with ``dt = t_i - t_{i+1}`` (final step
  uses ``dt = t_i``) (``:249-251``);
- CFG as a joint batch-of-2 per forward (``:238-239``), i.e. a single
  MagCache lane.

All schedule math is host numpy; the update is the only device op.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["RFlowSchedule"]


def timestep_transform_ratio(
    height: int,
    width: int,
    num_frames: int,
    base_resolution: int = 512 * 512,
    base_num_frames: int = 1,
    scale: float = 1.0,
) -> float:
    """The resolution/duration ratio of the Open-Sora timestep transform."""
    ratio_space = np.sqrt(height * width / base_resolution)
    frames = 1 if num_frames == 1 else (num_frames // 17) * 5
    frames = max(frames, 1)  # clips shorter than one 17-frame micro-frame
    ratio_time = np.sqrt(frames / base_num_frames)
    return float(ratio_space * ratio_time * scale)


@dataclasses.dataclass(frozen=True)
class RFlowSchedule:
    timesteps: np.ndarray      # f32[num_steps], descending, in [0, T]
    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @staticmethod
    def create(
        num_steps: int,
        *,
        num_train_timesteps: int = 1000,
        use_discrete_timesteps: bool = False,
        use_timestep_transform: bool = False,
        height: int = 512,
        width: int = 512,
        num_frames: int = 1,
        transform_scale: float = 1.0,
    ) -> "RFlowSchedule":
        ts = np.array(
            [(1.0 - i / num_steps) * num_train_timesteps for i in range(num_steps)],
            dtype=np.float64,
        )
        if use_discrete_timesteps:
            ts = np.round(ts)
        if use_timestep_transform:
            r = timestep_transform_ratio(
                height, width, num_frames, scale=transform_scale
            )
            t01 = ts / num_train_timesteps
            ts = (r * t01 / (1.0 + (r - 1.0) * t01)) * num_train_timesteps
        return RFlowSchedule(ts.astype(np.float32), num_train_timesteps)

    def dt(self, i: int) -> float:
        """``(t_i - t_{i+1})/T``; the final step integrates to zero."""
        t = self.timesteps
        raw = t[i] - t[i + 1] if i < self.num_steps - 1 else t[i]
        return float(raw) / self.num_train_timesteps

    def step(self, x: jnp.ndarray, v: jnp.ndarray, i) -> jnp.ndarray:
        dts = jnp.asarray(
            np.array([self.dt(j) for j in range(self.num_steps)], np.float32)
        )
        return x + dts[i].astype(x.dtype) * v.astype(x.dtype)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, i: int) -> jnp.ndarray:
        """``(1 - t/T) * x0 + t/T * noise``
        (reference RFlowScheduler.add_noise, ``:72-90``: timepoints = 1 - t/T)."""
        tp = 1.0 - float(self.timesteps[i]) / self.num_train_timesteps
        return tp * x0 + (1.0 - tp) * noise
