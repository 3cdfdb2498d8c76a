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


def ddpm_sample(
    schedule: DDPMSchedule,
    denoise_fn,
    key: jax.Array,
    shape: Tuple[int, ...],
) -> jnp.ndarray:
    """Ancestral DDPM sampling (capability-plus: the reference trains the
    denoiser but ships no sampler). denoise_fn(x_t, t[B]) -> predicted noise
    with x_t's shape. Runs the full reverse chain under lax.fori_loop —
    one compiled program, TPU-friendly.
    """
    beta = schedule.beta
    alpha = 1.0 - beta
    a_bar = schedule.alpha_bar
    T = schedule.num_time_steps

    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)

    def body(i, carry):
        x, key = carry
        t = T - 1 - i
        tb = jnp.full((shape[0],), t, jnp.int32)
        eps = denoise_fn(x, tb)
        coef = beta[t] / jnp.sqrt(1.0 - a_bar[t])
        mean = (x - coef * eps) / jnp.sqrt(alpha[t])
        key, nkey = jax.random.split(key)
        noise = jax.random.normal(nkey, shape)
        sigma = jnp.sqrt(beta[t])
        x = jnp.where(t > 0, mean + sigma * noise, mean)
        return (x, key)

    x, _ = jax.lax.fori_loop(0, T, body, (x, key))
    return x
