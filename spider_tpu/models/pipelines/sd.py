"""Stable-Diffusion-1.5-class text-to-image pipeline, TPU-native.

Functional counterpart of the reference's vendored diffusers pipeline
(/root/reference/spider/models/custom_sd.py:51,497,590-604):
  * ``return_prompts_only=True`` returns the text-encoder conditioning
    embeddings — the alignment target used by Spider's losses;
  * ``prompt_embeds=`` drives generation from projected LLM hidden states;
  * the whole CFG denoise loop is one jitted ``lax.scan``; models stay
    resident (the reference re-loads the pipeline from disk per request).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.common.registry import registry
from spider_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from spider_tpu.models.schedulers import DDIMScheduler
from spider_tpu.models.unet2d import UNet2DConditionModel, UNet2DConfig
from spider_tpu.models.vae import AutoencoderKL, VAEConfig


def pad_ids(ids: Sequence[int], length: int, pad_id: int) -> List[int]:
    ids = list(ids)[:length]
    return ids + [pad_id] * (length - len(ids))


@registry.register_model("sd")
class StableDiffusionPipeline:
    """Bundles text encoder + UNet + VAE params with a jitted denoise loop."""

    def __init__(self, tokenizer, text_encoder: CLIPTextModel, text_params,
                 unet: UNet2DConditionModel, unet_params,
                 vae: AutoencoderKL, vae_params,
                 scheduler: Optional[DDIMScheduler] = None,
                 height: int = 512, width: int = 512):
        self.tokenizer = tokenizer
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.scheduler = scheduler or DDIMScheduler()
        self.height = height
        self.width = width
        self._encode_jit = jax.jit(
            lambda p, ids: self.text_encoder.apply(p, ids)[0])
        self._denoise_cache: Dict[Tuple, Callable] = {}

    # ------------------------------------------------------------------ text
    def tokenize(self, prompts: Sequence[str]) -> jnp.ndarray:
        max_len = self.text_encoder.config.max_position_embeddings
        eos = getattr(self.tokenizer, "eos_token_id", 0)
        batch = []
        for p in prompts:
            ids = self.tokenizer(p, add_special_tokens=True).input_ids
            ids = list(ids)[: max_len - 1] + [eos]
            batch.append(pad_ids(ids, max_len, eos))
        return jnp.asarray(batch, dtype=jnp.int32)

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        """Text-conditioning embeddings [B, 77, D] (the return_prompts_only
        payload, cf. custom_sd.py:590-604)."""
        return self._encode_jit(self.text_params, self.tokenize(prompts))

    # --------------------------------------------------------------- denoise
    def _denoise_fn(self, num_steps: int, guidance_scale: float, shape,
                    eta: float = 0.0):
        key = (num_steps, guidance_scale, shape, eta)
        if key not in self._denoise_cache:
            sched = self.scheduler
            timesteps = sched.timesteps(num_steps)

            @jax.jit
            def run(unet_params, latents, cond, uncond, noise_key):
                context = jnp.concatenate([uncond, cond], axis=0)

                def step(latents, t):
                    lat_in = jnp.concatenate([latents, latents], axis=0)
                    tt = jnp.full((lat_in.shape[0],), t, jnp.int32)
                    eps = self.unet.apply(unet_params, lat_in, tt, context)
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                    noise = jax.random.normal(
                        jax.random.fold_in(noise_key, t), latents.shape,
                        jnp.float32) if eta > 0.0 else None
                    return sched.step(eps, t, latents, num_steps,
                                      eta=eta, noise=noise), None

                latents, _ = jax.lax.scan(step, latents, timesteps)
                return latents

            self._denoise_cache[key] = run
        return self._denoise_cache[key]

    def _decode_latents(self, latents: jnp.ndarray) -> np.ndarray:
        if not hasattr(self, "_decode_jit"):
            self._decode_jit = jax.jit(
                lambda p, l: (self.vae.apply(p, l, method=self.vae.decode)
                              / 2 + 0.5).clip(0.0, 1.0))
        return np.asarray(self._decode_jit(self.vae_params, latents))

    # ------------------------------------------------------------------ call
    def __call__(self, prompt: Optional[Sequence[str]] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 negative_prompt: Optional[Sequence[str]] = None,
                 guidance_scale: float = 7.5, num_inference_steps: int = 40,
                 return_prompts_only: bool = False,
                 rng: Optional[jax.Array] = None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 eta: float = 0.0):
        if return_prompts_only:
            assert prompt is not None
            return self.encode_prompt(prompt)
        if prompt_embeds is None:
            assert prompt is not None
            prompt_embeds = self.encode_prompt(prompt)
        B = prompt_embeds.shape[0]
        if negative_prompt is None:
            negative_prompt = [""] * B
        uncond = self.encode_prompt(negative_prompt)

        height = height or self.height
        width = width or self.width
        factor = 2 ** (len(self.vae.config.block_out_channels) - 1)
        lat_shape = (B, height // factor, width // factor,
                     self.unet.config.in_channels)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # init latents keep the bare rng (seed-stable vs the eta=0 path);
        # the stochastic-DDIM noise stream is derived, not split
        noise_key = jax.random.fold_in(rng, 1)
        latents = jax.random.normal(rng, lat_shape, dtype=jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma

        run = self._denoise_fn(num_inference_steps, guidance_scale, lat_shape,
                               eta=float(eta))
        latents = run(self.unet_params, latents,
                      prompt_embeds.astype(jnp.float32),
                      uncond.astype(jnp.float32), noise_key)
        return self._decode_latents(latents)  # [B, H, W, 3] float in [0,1]


def build_tiny_sd(tokenizer=None, rng=None) -> StableDiffusionPipeline:
    """Random-init tiny pipeline (CPU tests / offline demos)."""
    from spider_tpu.models.clip_text import clip_tiny
    from spider_tpu.models.unet2d import unet_tiny
    from spider_tpu.models.vae import vae_tiny
    from spider_tpu.models.tokenizer import TinyTokenizer

    from spider_tpu.models.factory import random_params_like

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    tcfg = clip_tiny(vocab_size=max(len(tokenizer), 300))
    text = CLIPTextModel(tcfg)
    tparams = random_params_like(text, rng, jnp.zeros((1, 77), jnp.int32))
    ucfg = unet_tiny(cross_attention_dim=tcfg.hidden_size)
    unet = UNet2DConditionModel(ucfg)
    uparams = random_params_like(unet, rng, jnp.zeros((1, 8, 8, 4)),
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 77, tcfg.hidden_size)))
    vcfg = vae_tiny()
    vae = AutoencoderKL(vcfg)
    vparams = random_params_like(vae, rng, jnp.zeros((1, 16, 16, 3)))
    return StableDiffusionPipeline(tokenizer, text, tparams, unet, uparams,
                                   vae, vparams, height=16, width=16)
