"""AudioLDM text-to-audio pipeline, TPU-native.

Counterpart of /root/reference/spider/models/custom_ad.py:48,421,530-544:
CLAP text embedding (the 512-d `return_prompts_only` payload and Spider's
AUDIO alignment target), UNet denoising of a mel-latent conditioned through
the class-embedding path, VAE mel decode, HiFiGAN vocoding.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.common.registry import registry
from spider_tpu.models.clip_text import ClapTextModel
from spider_tpu.models.pipelines.sd import pad_ids
from spider_tpu.models.schedulers import DDIMScheduler
from spider_tpu.models.unet2d import UNet2DConditionModel
from spider_tpu.models.vae import AutoencoderKL
from spider_tpu.models.vocoder import HifiGan


@registry.register_model("ad")
class AudioLDMPipeline:
    # AudioLDM operating constants (mel frames per second, bins).
    mel_bins_per_second = 102.4  # 16kHz, hop 160 -> 100 frames/s (approx; 8 latent)

    def __init__(self, tokenizer, text_encoder: ClapTextModel, text_params,
                 unet: UNet2DConditionModel, unet_params,
                 vae: AutoencoderKL, vae_params,
                 vocoder: HifiGan, vocoder_params,
                 scheduler: Optional[DDIMScheduler] = None,
                 mel_bins: int = 64):
        self.tokenizer = tokenizer
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.scheduler = scheduler or DDIMScheduler()
        self.mel_bins = mel_bins
        self._encode_jit = jax.jit(
            lambda p, ids, mask: self.text_encoder.apply(p, ids, mask)[1])
        self._denoise_cache: Dict[Tuple, Callable] = {}

    def tokenize(self, prompts: Sequence[str]):
        max_len = 77
        pad = getattr(self.tokenizer, "pad_token_id", 0)
        ids_batch, mask_batch = [], []
        for p in prompts:
            ids = list(self.tokenizer(p, add_special_tokens=True).input_ids)[:max_len]
            mask_batch.append(pad_ids([1] * len(ids), max_len, 0))
            ids_batch.append(pad_ids(ids, max_len, pad))
        return (jnp.asarray(ids_batch, jnp.int32),
                jnp.asarray(mask_batch, jnp.int32))

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        """Pooled CLAP embedding [B, 512], L2-normalized (custom_ad.py:530-544)."""
        ids, mask = self.tokenize(prompts)
        emb = self._encode_jit(self.text_params, ids, mask)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    # Scan segment size: the monolithic 40-step scan program reliably
    # faults the TPU worker on the axon relay (20-step compiles/runs fine;
    # value-independent — reproduced with all-zero inputs and a fresh
    # compile cache). Timesteps are an ARGUMENT, so one compiled
    # segment-program serves the whole trajectory in chunks.
    SCAN_SEGMENT = 20

    def _denoise_fn(self, num_steps: int, guidance_scale: float, shape,
                    eta: float = 0.0):
        seg = min(self.SCAN_SEGMENT, num_steps)
        key = (seg, guidance_scale, shape, eta)
        if key not in self._denoise_cache:
            sched = self.scheduler

            @jax.jit
            def run(unet_params, latents, cond, uncond, timesteps, num_steps,
                    noise_key):
                class_embeds = jnp.concatenate([uncond, cond], axis=0)
                # AudioLDM passes the CLAP vector via the class-embedding path;
                # cross-attention context is a dummy of the same vector.
                context = class_embeds[:, None, :]

                def step(latents, t):
                    lat_in = jnp.concatenate([latents, latents], axis=0)
                    tt = jnp.full((lat_in.shape[0],), t, jnp.int32)
                    eps = self.unet.apply(
                        unet_params, lat_in, tt, context,
                        added_cond=dict(class_embeds=class_embeds))
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

        seg_run = self._denoise_cache[key]
        all_ts = np.asarray(self.scheduler.timesteps(num_steps))

        def run_all(unet_params, latents, cond, uncond, noise_key):
            n_total = jnp.asarray(num_steps, jnp.int32)
            for i in range(0, num_steps, seg):
                # a shorter tail chunk just specializes the same jitted fn
                latents = seg_run(unet_params, latents, cond, uncond,
                                  jnp.asarray(all_ts[i:i + seg]), n_total,
                                  noise_key)
            return latents

        return run_all

    def __call__(self, prompt: Optional[Sequence[str]] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 negative_prompt: Optional[Sequence[str]] = None,
                 guidance_scale: float = 7.5, num_inference_steps: int = 40,
                 audio_length_in_s: float = 5.0,
                 return_prompts_only: bool = False,
                 rng: Optional[jax.Array] = None, eta: float = 0.0):
        if return_prompts_only:
            assert prompt is not None
            return self.encode_prompt(prompt)
        if prompt_embeds is None:
            assert prompt is not None
            prompt_embeds = self.encode_prompt(prompt)
        else:
            prompt_embeds = prompt_embeds / jnp.linalg.norm(
                prompt_embeds, axis=-1, keepdims=True)
        B = prompt_embeds.shape[0]
        if negative_prompt is None:
            negative_prompt = [""] * B
        uncond = self.encode_prompt(negative_prompt)

        factor = 2 ** (len(self.vae.config.block_out_channels) - 1)
        unet_factor = 2 ** (len(self.unet.config.block_out_channels) - 1)
        # Latent "image": time frames x mel bins; the latent time extent must
        # tile through both the VAE and the UNet's downsample pyramid.
        frames = int(audio_length_in_s * self.mel_bins_per_second)
        lat_t = max(unet_factor, frames // factor)
        lat_t = ((lat_t + unet_factor - 1) // unet_factor) * unet_factor
        lat_shape = (B, lat_t, self.mel_bins // factor,
                     self.unet.config.in_channels)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        latents = jax.random.normal(rng, lat_shape, dtype=jnp.float32)

        run = self._denoise_fn(num_inference_steps, guidance_scale, lat_shape,
                               eta=float(eta))
        latents = run(self.unet_params, latents,
                      prompt_embeds.astype(jnp.float32),
                      uncond.astype(jnp.float32),
                      jax.random.fold_in(rng, 1))
        # VAE mel decode + HiFiGAN vocoding in ONE jitted call (eager
        # dispatch of the vocoder's op stream crashes the relay worker and
        # pays per-op round trips).
        if not hasattr(self, "_decode_jit"):
            self._decode_jit = jax.jit(
                lambda vp, hp, l: self.vocoder.apply(
                    hp, self.vae.apply(vp, l, method=self.vae.decode)[..., 0]))
        wave = self._decode_jit(self.vae_params, self.vocoder_params, latents)
        return np.asarray(wave)


def build_full_ad(tokenizer=None, rng=None) -> AudioLDMPipeline:
    """AudioLDM-l-sized pipeline (random init, bf16) at the reference
    operating point: 740M UNet + CLAP text + mel VAE + HiFiGAN, 5.0 s audio
    (custom_ad.py:421 / spider.py:500-501)."""
    import dataclasses as dc

    from spider_tpu.models.clip_text import ClapTextConfig
    from spider_tpu.models.tokenizer import TinyTokenizer
    from spider_tpu.models.unet2d import unet_audioldm
    from spider_tpu.models.vae import vae_audioldm
    from spider_tpu.models.vocoder import HifiGan, hifigan_audioldm

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

    tcfg = dc.replace(ClapTextConfig(), dtype=jnp.bfloat16)
    text = ClapTextModel(tcfg)
    # cross-attn context is the (dummy-broadcast) CLAP vector, so the
    # cross_attention_dim must equal the CLAP projection dim (see
    # _denoise_fn: conditioning rides the class-embedding path).
    ucfg = dc.replace(unet_audioldm(), dtype=jnp.bfloat16,
                      cross_attention_dim=tcfg.projection_dim,
                      addition_embed_type="class_embed",
                      projection_class_embeddings_input_dim=tcfg.projection_dim)
    unet = UNet2DConditionModel(ucfg)
    vcfg = dc.replace(vae_audioldm(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    hcfg = hifigan_audioldm()
    voc = HifiGan(hcfg)
    from spider_tpu.models.factory import random_params_like
    bf = jnp.bfloat16   # on-device bf16 pools: zero host->device traffic
    tparams = random_params_like(text, rng, jnp.zeros((1, 8), jnp.int32),
                                 dtype=bf, on_device=True)
    uparams = random_params_like(
        unet, rng, jnp.zeros((1, 8, 8, ucfg.in_channels), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, ucfg.cross_attention_dim), jnp.bfloat16),
        dict(class_embeds=jnp.zeros((1, tcfg.projection_dim),
                                    jnp.bfloat16)), dtype=bf, on_device=True)
    vparams = random_params_like(vae, rng, jnp.zeros((1, 16, 16, 1)),
                                 dtype=bf, on_device=True)
    hparams = random_params_like(voc, rng,
                                 jnp.zeros((1, 16, hcfg.model_in_dim)),
                                 dtype=bf, on_device=True)
    tparams, uparams, vparams, hparams = map(
        to_dev_bf16, (tparams, uparams, vparams, hparams))
    return AudioLDMPipeline(tokenizer, text, tparams, unet, uparams, vae,
                            vparams, voc, hparams, mel_bins=64)


def build_tiny_ad(tokenizer=None, rng=None) -> AudioLDMPipeline:
    from spider_tpu.models.clip_text import clap_tiny
    from spider_tpu.models.tokenizer import TinyTokenizer
    from spider_tpu.models.unet2d import unet_tiny
    from spider_tpu.models.vae import vae_tiny
    from spider_tpu.models.vocoder import HifiGanConfig, hifigan_tiny
    import dataclasses as dc

    from spider_tpu.models.factory import random_params_like

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    tcfg = clap_tiny(vocab_size=max(len(tokenizer), 300))
    text = ClapTextModel(tcfg)
    tparams = random_params_like(text, rng, jnp.zeros((1, 8), jnp.int32))
    ucfg = unet_tiny(cross_attention_dim=tcfg.projection_dim,
                     addition_embed_type="class_embed",
                     projection_dim=tcfg.projection_dim)
    unet = UNet2DConditionModel(ucfg)
    uparams = random_params_like(
        unet, rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, tcfg.projection_dim)),
        dict(class_embeds=jnp.zeros((1, tcfg.projection_dim))))
    vcfg = dc.replace(vae_tiny(), in_channels=1, out_channels=1)
    vae = AutoencoderKL(vcfg)
    vparams = random_params_like(vae, rng, jnp.zeros((1, 16, 16, 1)))
    hcfg = hifigan_tiny()
    voc = HifiGan(hcfg)
    hparams = random_params_like(voc, rng,
                                 jnp.zeros((1, 16, hcfg.model_in_dim)))
    return AudioLDMPipeline(tokenizer, text, tparams, unet, uparams, vae,
                            vparams, voc, hparams, mel_bins=8)
