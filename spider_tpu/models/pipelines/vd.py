"""Text-to-video pipeline (ZeroScope class), TPU-native.

Counterpart of /root/reference/spider/models/custom_vd.py:93,525,620-638 —
same `return_prompts_only` hook and `prompt_embeds` drive; the CFG denoise
loop is a jitted scan over a [B,F,h,w,4] latent volume and frames are decoded
through the 2-D VAE with frames folded into the batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.common.registry import registry
from spider_tpu.models.clip_text import CLIPTextModel
from spider_tpu.models.pipelines.sd import pad_ids
from spider_tpu.models.schedulers import DDIMScheduler
from spider_tpu.models.unet3d import UNet3DConditionModel
from spider_tpu.models.vae import AutoencoderKL


@registry.register_model("vd")
class TextToVideoSDPipeline:
    def __init__(self, tokenizer, text_encoder: CLIPTextModel, text_params,
                 unet: UNet3DConditionModel, unet_params,
                 vae: AutoencoderKL, vae_params,
                 scheduler: Optional[DDIMScheduler] = None):
        self.tokenizer = tokenizer
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.scheduler = scheduler or DDIMScheduler()
        self._encode_jit = jax.jit(
            lambda p, ids: self.text_encoder.apply(p, ids)[0])
        self._denoise_cache: Dict[Tuple, Callable] = {}

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
        return self._encode_jit(self.text_params, self.tokenize(prompts))

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

    def _denoise_fn_sharded(self, num_steps: int, guidance_scale: float,
                            shape, mesh):
        """Mesh-sharded CFG denoise: the CFG pair over a `cfg` axis and the
        frame dimension over a `sp` axis (docs/video_speed_of_light.md —
        one CFG step is 27.9 TFLOP, FLOP-bound at ~70% of the single-chip
        ceiling, so the <=7 s stage target requires dividing the step over
        the slice). Spatial convs/attention fold frames into the batch and
        parallelize cleanly; temporal attention (F=16), the kernel-3
        temporal-conv halo and GroupNorm stats become small collectives
        XLA inserts from the sharding constraints."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        key = (num_steps, guidance_scale, shape, mesh)
        if key not in self._denoise_cache:
            sched = self.scheduler
            timesteps = sched.timesteps(num_steps)
            rep = NamedSharding(mesh, P())
            lat_sh = NamedSharding(mesh, P(None, "sp"))    # [B,F,h,w,c]
            pair_sh = NamedSharding(mesh, P("cfg", "sp"))  # [2B,F,h,w,c]
            ctx_sh = NamedSharding(mesh, P("cfg"))         # [2B,77,D]

            import functools

            @functools.partial(
                jax.jit, in_shardings=(rep, lat_sh, rep, rep),
                out_shardings=lat_sh)
            def run(unet_params, latents, cond, uncond):
                context = jax.lax.with_sharding_constraint(
                    jnp.concatenate([uncond, cond], axis=0), ctx_sh)

                def step(latents, t):
                    lat_in = jax.lax.with_sharding_constraint(
                        jnp.concatenate([latents, latents], axis=0), pair_sh)
                    tt = jnp.full((lat_in.shape[0],), t, jnp.int32)
                    eps = self.unet.apply(unet_params, lat_in, tt, context)
                    eps = jax.lax.with_sharding_constraint(eps, pair_sh)
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                    return sched.step(eps, t, latents, num_steps), None

                latents, _ = jax.lax.scan(step, latents, timesteps)
                return latents

            self._denoise_cache[key] = run
        return self._denoise_cache[key]

    def __call__(self, prompt: Optional[Sequence[str]] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 negative_prompt: Optional[Sequence[str]] = None,
                 guidance_scale: float = 7.5, num_inference_steps: int = 40,
                 height: int = 320, width: int = 576, num_frames: int = 16,
                 return_prompts_only: bool = False,
                 rng: Optional[jax.Array] = None, mesh=None,
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

        factor = 2 ** (len(self.vae.config.block_out_channels) - 1)
        lat_shape = (B, num_frames, height // factor, width // factor,
                     self.unet.config.in_channels)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        latents = jax.random.normal(rng, lat_shape, dtype=jnp.float32)

        if mesh is not None:
            assert eta == 0.0, "eta not supported on the sharded denoise"
            run = self._denoise_fn_sharded(num_inference_steps,
                                           guidance_scale, lat_shape, mesh)
            latents = run(self.unet_params, latents,
                          prompt_embeds.astype(jnp.float32),
                          uncond.astype(jnp.float32))
        else:
            run = self._denoise_fn(num_inference_steps, guidance_scale,
                                   lat_shape, eta=float(eta))
            latents = run(self.unet_params, latents,
                          prompt_embeds.astype(jnp.float32),
                          uncond.astype(jnp.float32),
                          jax.random.fold_in(rng, 1))
        # Decode frames through the 2-D VAE: ONE device call (multi-call
        # chunking pays per-dispatch overhead on the relay; full batch-16
        # measured 0.95 s vs 3.1 s in 4-frame chunks) and uint8 output (the
        # 16x640x1152x3 result is 136 MB in fp32 but 34 MB as uint8 — the
        # host transfer is part of request latency).
        B_, F, h, w, c = latents.shape
        flat = latents.reshape(B_ * F, h, w, c)
        if mesh is not None:
            # frames divide over the whole slice (16 -> 2 per device on 8)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            if not hasattr(self, "_decode_jit_sharded"):
                flat_sh = NamedSharding(mesh, P(("cfg", "sp")))

                def _decode(p, l):
                    # incoming latents arrive P(None,'sp') from the denoise
                    # reshape; respread frames over the whole slice
                    l = jax.lax.with_sharding_constraint(l, flat_sh)
                    img = self.vae.apply(p, l, method=self.vae.decode)
                    return ((img / 2 + 0.5).clip(0.0, 1.0) * 255.0) \
                        .astype(jnp.uint8)

                self._decode_jit_sharded = jax.jit(
                    _decode, out_shardings=flat_sh)
            frames = np.asarray(self._decode_jit_sharded(self.vae_params,
                                                         flat))
        else:
            if not hasattr(self, "_decode_jit"):
                self._decode_jit = jax.jit(
                    lambda p, l: ((self.vae.apply(p, l,
                                                  method=self.vae.decode)
                                   / 2 + 0.5).clip(0.0, 1.0) * 255.0)
                    .astype(jnp.uint8))
            frames = np.asarray(self._decode_jit(self.vae_params, flat))
        H, W = frames.shape[1:3]
        return frames.reshape(B_, F, H, W, 3)


def build_full_vd(tokenizer=None, rng=None) -> TextToVideoSDPipeline:
    """ZeroScope-sized pipeline (random init, bf16) at the reference
    operating point: 1.4B UNet3D + CLIP-H text + SD VAE, 576x320x16f
    (custom_vd.py:525 / spider.py:462-463). Weight conversion drops real
    checkpoints into the same trees (models/convert.py)."""
    import dataclasses as dc

    from spider_tpu.models.clip_text import CLIPTextModel, clip_vit_h14
    from spider_tpu.models.tokenizer import TinyTokenizer
    from spider_tpu.models.unet3d import unet3d_zeroscope
    from spider_tpu.models.vae import vae_sd

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    dev = jax.devices()[0]

    def to_dev_bf16(tree):
        def leaf(x):
            if isinstance(x, jax.Array):      # already device-resident
                return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
            a = np.asarray(x)
            return a.astype(jnp.bfloat16) if a.dtype == np.float32 else a
        return jax.device_put(jax.tree_util.tree_map(leaf, tree), dev)

    tcfg = dc.replace(clip_vit_h14(), dtype=jnp.bfloat16)
    text = CLIPTextModel(tcfg)
    ucfg = dc.replace(unet3d_zeroscope(), dtype=jnp.bfloat16)
    unet = UNet3DConditionModel(ucfg)
    vcfg = dc.replace(vae_sd(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    from spider_tpu.models.factory import random_params_like
    bf = jnp.bfloat16   # on-device bf16 pools: zero host->device traffic
    tparams = random_params_like(text, rng, jnp.zeros((1, 77), jnp.int32),
                                 dtype=bf, on_device=True)
    uparams = random_params_like(
        unet, rng, jnp.zeros((1, 2, 8, 8, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16),
        dtype=bf, on_device=True)
    vparams = random_params_like(vae, rng, jnp.zeros((1, 64, 64, 3)),
                                 dtype=bf, on_device=True)
    tparams, uparams, vparams = map(to_dev_bf16, (tparams, uparams, vparams))
    return TextToVideoSDPipeline(tokenizer, text, tparams, unet, uparams,
                                 vae, vparams)


def build_tiny_vd(tokenizer=None, rng=None) -> TextToVideoSDPipeline:
    from spider_tpu.models.clip_text import CLIPTextModel, clip_tiny
    from spider_tpu.models.tokenizer import TinyTokenizer
    from spider_tpu.models.unet3d import unet3d_tiny
    from spider_tpu.models.vae import vae_tiny

    from spider_tpu.models.factory import random_params_like

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    tcfg = clip_tiny(vocab_size=max(len(tokenizer), 300))
    text = CLIPTextModel(tcfg)
    tparams = random_params_like(text, rng, jnp.zeros((1, 77), jnp.int32))
    ucfg = unet3d_tiny(cross_attention_dim=tcfg.hidden_size)
    unet = UNet3DConditionModel(ucfg)
    uparams = random_params_like(unet, rng, jnp.zeros((1, 2, 8, 8, 4)),
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 77, tcfg.hidden_size)))
    vcfg = vae_tiny()
    vae = AutoencoderKL(vcfg)
    vparams = random_params_like(vae, rng, jnp.zeros((1, 16, 16, 3)))
    return TextToVideoSDPipeline(tokenizer, text, tparams, unet, uparams,
                                 vae, vparams)
