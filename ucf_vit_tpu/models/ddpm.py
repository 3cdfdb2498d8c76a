"""DDPM noise scheduler.

Capability parity with reference `src/UCF_VIT/ddpm/ddpm.py:4-13`: linear
beta in [1e-4, 0.02] over num_time_steps, alpha-bar = cumprod(1 - beta).
Pure arrays (no module state) — jit-safe constants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DDPMSchedule(NamedTuple):
    beta: jnp.ndarray  # [T]
    alpha_bar: jnp.ndarray  # [T] cumulative product of (1 - beta)
    num_time_steps: int


def ddpm_schedule(num_time_steps: int = 1000) -> DDPMSchedule:
    beta = jnp.linspace(1e-4, 0.02, num_time_steps, dtype=jnp.float32)
    alpha_bar = jnp.cumprod(1.0 - beta)
    return DDPMSchedule(beta=beta, alpha_bar=alpha_bar, num_time_steps=num_time_steps)


def q_sample(
    schedule: DDPMSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion: sqrt(a_bar_t) x0 + sqrt(1 - a_bar_t) noise.

    Parity with the host-side noising in `train_diffusion_fsdp.py:469-476`.
    t: [B] int32; broadcast over trailing dims of x0.
    """
    a = schedule.alpha_bar[t]
    shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
    a = a.reshape(shape)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def sample_timesteps(key: jax.Array, batch: int, num_time_steps: int) -> jnp.ndarray:
    return jax.random.randint(key, (batch,), 0, num_time_steps)
