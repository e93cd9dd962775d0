"""Diffusion noise schedulers — functional, static-shape, `lax.scan`-friendly.

DDIM covers SD-1.5 / ZeroScope / AudioLDM (the reference runs 40 DDIM-style
steps, cf. BASELINE.md); Euler-discrete covers SDXL/StoryDiffusion (50 steps,
Comic_Generation.py:341-352). State is carried explicitly — no mutable
scheduler objects inside jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp


def make_betas(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
               beta_end: float = 0.012, schedule: str = "scaled_linear") -> jnp.ndarray:
    if schedule == "scaled_linear":
        return jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=jnp.float32) ** 2
    if schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=jnp.float32)
    if schedule == "squaredcos_cap_v2":
        t = jnp.arange(num_train_timesteps + 1, dtype=jnp.float32) / num_train_timesteps
        alphas_bar = jnp.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
        return jnp.clip(betas, 0.0, 0.999)
    raise ValueError(schedule)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    prediction_type: str = "epsilon"    # or "v_prediction"
    set_alpha_to_one: bool = False

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        betas = make_betas(self.num_train_timesteps, self.beta_start,
                           self.beta_end, self.beta_schedule)
        return jnp.cumprod(1.0 - betas)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        step = self.num_train_timesteps // num_inference_steps
        t = (jnp.arange(num_inference_steps) * step).round()[::-1]
        return (t + self.steps_offset).astype(jnp.int32)

    def scale_model_input(self, sample: jnp.ndarray, t) -> jnp.ndarray:
        return sample

    def step(self, model_output: jnp.ndarray, timestep: jnp.ndarray,
             sample: jnp.ndarray, num_inference_steps: int,
             eta: float = 0.0,
             noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """One DDIM update; eta > 0 (with `noise`) gives the stochastic
        variant (diffusers DDIMScheduler.step eta semantics — the reference
        pipelines expose `eta` through prepare_extra_step_kwargs,
        custom_sd.py)."""
        acp = self.alphas_cumprod
        prev_timestep = timestep - self.num_train_timesteps // num_inference_steps
        alpha_t = acp[timestep]
        final_alpha = jnp.float32(1.0) if self.set_alpha_to_one else acp[0]
        alpha_prev = jnp.where(prev_timestep >= 0, acp[jnp.maximum(prev_timestep, 0)],
                               final_alpha)
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        if self.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(alpha_t) * x - jnp.sqrt(1 - alpha_t) * eps
            eps = jnp.sqrt(alpha_t) * eps + jnp.sqrt(1 - alpha_t) * x
        else:
            pred_x0 = (x - jnp.sqrt(1 - alpha_t) * eps) / jnp.sqrt(alpha_t)
        if eta > 0.0:
            assert noise is not None, "eta > 0 requires noise"
            variance = ((1 - alpha_prev) / (1 - alpha_t)
                        * (1 - alpha_t / alpha_prev))
            sigma = eta * jnp.sqrt(variance)
            prev = (jnp.sqrt(alpha_prev) * pred_x0
                    + jnp.sqrt(1 - alpha_prev - sigma ** 2) * eps
                    + sigma * noise.astype(jnp.float32))
        else:
            prev = jnp.sqrt(alpha_prev) * pred_x0 + jnp.sqrt(1 - alpha_prev) * eps
        return prev.astype(sample.dtype)

    def add_noise(self, sample, noise, timestep):
        acp = self.alphas_cumprod
        a = jnp.sqrt(acp[timestep]).reshape((-1,) + (1,) * (sample.ndim - 1))
        b = jnp.sqrt(1 - acp[timestep]).reshape((-1,) + (1,) * (sample.ndim - 1))
        return a * sample + b * noise


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    """Euler method over the karras sigma parameterization (SDXL default)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"

    def sigmas_and_timesteps(self, num_inference_steps: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        betas = make_betas(self.num_train_timesteps, self.beta_start,
                           self.beta_end, self.beta_schedule)
        acp = jnp.cumprod(1.0 - betas)
        all_sigmas = jnp.sqrt((1 - acp) / acp)
        if self.timestep_spacing == "leading":
            step = self.num_train_timesteps // num_inference_steps
            t = (jnp.arange(num_inference_steps) * step).round()[::-1]
            t = t + self.steps_offset
        else:  # linspace
            t = jnp.linspace(0, self.num_train_timesteps - 1,
                             num_inference_steps)[::-1].round()
        t = t.astype(jnp.int32)
        sigmas = all_sigmas[t]
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])
        return sigmas, t

    def init_noise_sigma(self, sigmas: jnp.ndarray) -> jnp.ndarray:
        if self.timestep_spacing in ("linspace",):
            return sigmas.max()
        return jnp.sqrt(sigmas.max() ** 2 + 1)

    def scale_model_input(self, sample: jnp.ndarray, sigma) -> jnp.ndarray:
        return sample / jnp.sqrt(sigma ** 2 + 1)

    def step(self, model_output: jnp.ndarray, sigma, sigma_next,
             sample: jnp.ndarray) -> jnp.ndarray:
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            pred_x0 = x - sigma * eps
        else:  # v_prediction
            pred_x0 = eps * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + x / (sigma ** 2 + 1)
        d = (x - pred_x0) / sigma
        return (x + d * (sigma_next - sigma)).astype(sample.dtype)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings (diffusers convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
