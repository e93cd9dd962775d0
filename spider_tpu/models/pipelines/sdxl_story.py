"""SDXL pipeline + StoryDiffusion consistent multi-image story generation,
TPU-native.

Counterpart of /root/reference/StoryDiffusion/Comic_Generation.py:297-467: a
two-text-encoder SDXL denoiser where the up-block self-attentions are
batch-coupled ("consistent self-attention"): every image's self-attn K/V is
augmented with tokens randomly sampled from the first ``id_length`` images of
the batch at the same denoise step. The reference implements this with a
swapped-in attention processor and a two-phase (write id images, then read)
loop; here the id and story images denoise JOINTLY in a single jitted
``lax.scan`` — id rows see only id tokens, story rows see id tokens + their
own, which reproduces the write/read semantics without a mutable id bank.

Random sampling masks (cal_attn_mask_xl analogue) become per-block fixed-size
index arrays drawn once per request on the host.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.common.registry import registry
from spider_tpu.models.clip_text import CLIPTextModel
from spider_tpu.models.pipelines.sd import pad_ids
from spider_tpu.models.schedulers import EulerDiscreteScheduler
from spider_tpu.models.unet2d import UNet2DConditionModel
from spider_tpu.models.vae import AutoencoderKL

# Style templates (same style names as the reference's
# StoryDiffusion/utils/style_template.py — part of the system-prompt contract;
# template wording is our own).
STYLE_TEMPLATES: Dict[str, Tuple[str, str]] = {
    "(No style)": ("{prompt}", ""),
    "Japanese Anime": (
        "anime artwork of {prompt}, anime style, vibrant colors, clean line art,"
        " studio anime, key visual, highly detailed",
        "photo, realistic, black and white, low quality, deformed",
    ),
    "Digital/Oil Painting": (
        "an oil painting of {prompt}, rich brush strokes, digital painting,"
        " dramatic lighting, highly detailed, artstation quality",
        "photo, photorealistic, low quality, blurry, text, watermark",
    ),
    "Photographic": (
        "cinematic photo of {prompt}, 35mm photograph, film grain, bokeh,"
        " professional, 4k, highly detailed",
        "drawing, painting, cartoon, anime, sketch, low quality, deformed",
    ),
    "Comic book": (
        "comic book panel of {prompt}, bold outlines, halftone shading,"
        " graphic novel illustration, vivid colors",
        "photograph, realistic, 3d render, low quality, blurry",
    ),
}
DEFAULT_STYLE = "Japanese Anime"


def apply_style(style_name: str, prompts: Sequence[str],
                negative: str = "") -> Tuple[List[str], str]:
    pos, neg = STYLE_TEMPLATES.get(style_name, STYLE_TEMPLATES[DEFAULT_STYLE])
    return [pos.format(prompt=p) for p in prompts], (neg + " " + negative).strip()


@registry.register_model("sdxl_story")
class StoryXLPipeline:
    """SDXL with optional consistent self-attention over the batch."""

    def __init__(self, tokenizer, tokenizer_2,
                 text_encoder: CLIPTextModel, text_params,
                 text_encoder_2: CLIPTextModel, text_params_2,
                 unet: UNet2DConditionModel, unet_params,
                 vae: AutoencoderKL, vae_params,
                 scheduler: Optional[EulerDiscreteScheduler] = None,
                 height: int = 768, width: int = 768,
                 batched_cfg: Optional[bool] = None):
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.text_encoder_2 = text_encoder_2
        self.text_params_2 = text_params_2
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.scheduler = scheduler or EulerDiscreteScheduler()
        self.height = height
        self.width = width
        # CFG scheduling inside the denoise scan: batched runs uncond+cond as
        # ONE [2B] UNet call per step (num_groups=2 consistency groups) —
        # one weight read/step and a fuller MXU; split runs two [B] calls,
        # halving peak activations. TPU HBM fits the batched story step at
        # 768px, so batched is the default there.
        if batched_cfg is None:
            batched_cfg = jax.default_backend() == "tpu"
        self.batched_cfg = batched_cfg
        self._denoise_cache: Dict[Tuple, Callable] = {}

    # ------------------------------------------------------------------ text
    def _tokenize(self, tokenizer, prompts, max_len, eos):
        batch = []
        for p in prompts:
            ids = list(tokenizer(p, add_special_tokens=True).input_ids)
            ids = ids[: max_len - 1] + [eos]
            batch.append(pad_ids(ids, max_len, eos))
        return jnp.asarray(batch, jnp.int32)

    def encode_prompt(self, prompts: Sequence[str]):
        """SDXL conditioning: concat penultimate hidden states of both
        encoders [B,77,768+1280] + pooled projection of encoder 2 [B,1280].
        One jitted call for both encoders (eager apply dispatched the whole
        CLIP op stream per request — measured ~12 s of a 15 s story)."""
        c1 = self.text_encoder.config
        ids1 = self._tokenize(self.tokenizer, prompts,
                              c1.max_position_embeddings, c1.eos_token_id)
        c2 = self.text_encoder_2.config
        ids2 = self._tokenize(self.tokenizer_2, prompts,
                              c2.max_position_embeddings, c2.eos_token_id)
        if not hasattr(self, "_encode_jit"):
            def enc(p1, p2, ids1, ids2):
                _, h1, _ = self.text_encoder.apply(p1, ids1)
                _, h2, pooled = self.text_encoder_2.apply(p2, ids2)
                return jnp.concatenate([h1[-2], h2[-2]], axis=-1), pooled

            self._encode_jit = jax.jit(enc)
        return self._encode_jit(self.text_params, self.text_params_2,
                                ids1, ids2)

    def encode_prompt_photomaker(self, prompts: Sequence[str], id_pixels,
                                 id_encoder, id_params,
                                 trigger_word: str = "img"):
        """PhotoMaker ref-image conditioning (StoryDiffusion "Using Ref
        Images", utils/pipeline.py:31): trigger-word surgery on both
        tokenizers, encode, then fuse the id-image embeddings into the
        concatenated SDXL context at the duplicated class-token positions
        (models/photomaker.py)."""
        from spider_tpu.models.photomaker import prompts_with_trigger

        c1, c2 = self.text_encoder.config, self.text_encoder_2.config
        n_id = int(id_pixels.shape[0])
        ids1, mask1 = prompts_with_trigger(
            self.tokenizer, prompts, trigger_word, n_id,
            c1.max_position_embeddings, c1.eos_token_id)
        ids2, mask2 = prompts_with_trigger(
            self.tokenizer_2, prompts, trigger_word, n_id,
            c2.max_position_embeddings, c2.eos_token_id)
        assert (mask1 == mask2).all(), \
            "the two tokenizers disagree on trigger positions"
        if not hasattr(self, "_encode_pm_jit"):
            def enc(p1, p2, pe, ids1, ids2, pixels, mask):
                _, h1, _ = self.text_encoder.apply(p1, ids1)
                _, h2, pooled = self.text_encoder_2.apply(p2, ids2)
                ctx = jnp.concatenate([h1[-2], h2[-2]], axis=-1)
                return id_encoder.apply(pe, pixels, ctx, mask), pooled

            self._encode_pm_jit = jax.jit(enc)
        return self._encode_pm_jit(self.text_params, self.text_params_2,
                                   id_params, jnp.asarray(ids1),
                                   jnp.asarray(ids2), id_pixels,
                                   jnp.asarray(mask1))

    # --------------------------------------------------------------- denoise
    def _denoise_fn(self, num_steps, guidance_scale, shape, id_length,
                    story_shapes):
        key = (num_steps, guidance_scale, shape, id_length, story_shapes,
               self.batched_cfg)
        if key not in self._denoise_cache:
            sched = self.scheduler
            sigmas, timesteps = sched.sigmas_and_timesteps(num_steps)
            batched = self.batched_cfg

            @jax.jit
            def run(unet_params, latents, ctx, pooled, uncond_ctx,
                    uncond_pooled, time_ids, story_indices):
                B = latents.shape[0]
                # id_length is static (cache key); indices are traced arrays.
                # Consistency groups never mix uncond and cond rows: split
                # CFG makes each call one group; batched CFG stacks them as
                # two groups of the one [2B] call (num_groups=2).
                groups = 2 if batched else 1
                story = {
                    path: dict(id_length=id_length, indices=idx,
                               num_groups=groups)
                    for path, idx in story_indices.items()
                } if story_indices else None

                if batched:
                    ctx2 = jnp.concatenate([uncond_ctx, ctx], axis=0)
                    pooled2 = jnp.concatenate([uncond_pooled, pooled], axis=0)
                    tid2 = jnp.concatenate([time_ids, time_ids], axis=0)

                def step(latents, inp):
                    sigma, sigma_next, t = inp
                    lat_in = sched.scale_model_input(latents, sigma)
                    if batched:
                        tt = jnp.full((2 * B,), t, jnp.int32)
                        eps2 = self.unet.apply(
                            unet_params,
                            jnp.concatenate([lat_in, lat_in], axis=0), tt,
                            ctx2, added_cond=dict(text_embeds=pooled2,
                                                  time_ids=tid2), story=story)
                        eps_u, eps_c = eps2[:B], eps2[B:]
                    else:
                        tt = jnp.full((B,), t, jnp.int32)
                        eps_u = self.unet.apply(
                            unet_params, lat_in, tt, uncond_ctx,
                            added_cond=dict(text_embeds=uncond_pooled,
                                            time_ids=time_ids), story=story)
                        eps_c = self.unet.apply(
                            unet_params, lat_in, tt, ctx,
                            added_cond=dict(text_embeds=pooled,
                                            time_ids=time_ids), story=story)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                    return sched.step(eps, sigma, sigma_next, latents), None

                xs = (sigmas[:-1], sigmas[1:], timesteps)
                latents, _ = jax.lax.scan(step, latents, xs)
                return latents

            self._denoise_cache[key] = run
        return self._denoise_cache[key]

    def _story_indices(self, id_length: int, lat_hw: Tuple[int, int],
                       sa_ratio: float, rng: np.random.Generator):
        """Per-up-block fixed-count sampled token indices into the flattened
        id-token bank (cal_attn_mask_xl analogue with static shapes)."""
        cfg = self.unet.config
        out = {}
        h, w = lat_hw
        rev = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.cross_attn_blocks))
        rev_depth = list(reversed(cfg.transformer_layers_per_block))
        # spatial extent at each up level: mid resolution * 2^i
        for i, _ in enumerate(rev):
            scale = 2 ** (len(rev) - 1 - i)
            hw = (h // scale) * (w // scale)
            total = id_length * hw
            count = max(1, int(total * sa_ratio))
            for j in range(cfg.layers_per_block + 1):
                if rev_attn[i] and rev_depth[i] > 0:
                    idx = rng.choice(total, size=count, replace=False)
                    out[f"up_{i}_attn_{j}"] = jnp.asarray(np.sort(idx), jnp.int32)
        return out

    # ------------------------------------------------------------------ call
    def __call__(self, prompt: Sequence[str],
                 negative_prompt: str = "",
                 guidance_scale: float = 5.0, num_inference_steps: int = 50,
                 id_length: int = 0, sa_ratio: float = 0.5,
                 height: Optional[int] = None, width: Optional[int] = None,
                 rng: Optional[jax.Array] = None, seed: int = 0,
                 ref_images: Optional[Sequence[np.ndarray]] = None,
                 id_encoder=None, id_params=None,
                 trigger_word: str = "img"):
        """Generate len(prompt) images; if id_length > 0, the first id_length
        rows are identity images and ALL rows share consistent self-attn.
        With ref_images + a PhotoMaker id_encoder, identity comes from the
        reference photos via trigger-word fusion (PhotoMaker mode)."""
        height = height or self.height
        width = width or self.width
        B = len(prompt)
        if ref_images is not None:
            from spider_tpu.models.photomaker import preprocess_id_images

            assert id_encoder is not None and id_params is not None, \
                "ref_images requires a PhotoMaker id_encoder (+params)"
            id_pixels = preprocess_id_images(
                ref_images, id_encoder.config.image_size)
            ctx, pooled = self.encode_prompt_photomaker(
                prompt, id_pixels, id_encoder, id_params, trigger_word)
        else:
            ctx, pooled = self.encode_prompt(prompt)
        un_ctx, un_pooled = self.encode_prompt([negative_prompt] * B)

        factor = 2 ** (len(self.vae.config.block_out_channels) - 1)
        lat_shape = (B, height // factor, width // factor,
                     self.unet.config.in_channels)
        rng = rng if rng is not None else jax.random.PRNGKey(seed)
        sigmas, _ = self.scheduler.sigmas_and_timesteps(num_inference_steps)
        latents = jax.random.normal(rng, lat_shape, jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma(sigmas)

        time_ids = jnp.tile(
            jnp.asarray([[height, width, 0, 0, height, width]], jnp.float32),
            (B, 1))

        story_indices = {}
        if id_length > 0:
            np_rng = np.random.default_rng(seed)
            story_indices = self._story_indices(
                id_length, lat_shape[1:3], sa_ratio, np_rng)

        story_key = tuple(sorted(
            (p, int(v.shape[0])) for p, v in story_indices.items()))
        run = self._denoise_fn(num_inference_steps, guidance_scale,
                               lat_shape, id_length, story_key)
        latents = run(self.unet_params, latents, ctx, pooled, un_ctx,
                      un_pooled, time_ids, story_indices)
        # decode in small chunks: full-res VAE activations for a whole story
        # batch exceed HBM at 768px+. Jitted (eager per-op dispatch is both
        # slow and unstable through the relay).
        if not hasattr(self, "_decode_jit"):
            self._decode_jit = jax.jit(
                lambda p, l: (self.vae.apply(p, l, method=self.vae.decode)
                              / 2 + 0.5).clip(0.0, 1.0))
        chunks = [np.asarray(self._decode_jit(self.vae_params,
                                              latents[i:i + 2]))
                  for i in range(0, latents.shape[0], 2)]
        return np.concatenate(chunks, axis=0)


def init_story_generation(pipe: StoryXLPipeline, **_unused) -> StoryXLPipeline:
    """Signature mirror of Comic_Generation.py:297 — decoders are resident."""
    return pipe


def story_generation(pipe: StoryXLPipeline, general_prompt: str,
                     prompt_array: Sequence[str], style_name: str,
                     id_length: int = 4, sa_ratio: float = 0.5,
                     num_inference_steps: int = 50, seed: int = 0,
                     height: Optional[int] = None, width: Optional[int] = None,
                     ref_images: Optional[Sequence[np.ndarray]] = None,
                     id_encoder=None, id_params=None,
                     trigger_word: str = "img") -> List[np.ndarray]:
    """The reference's two-phase story generation (Comic_Generation.py:320-467)
    as one consistent joint batch: id images seed identity, then every story
    frame is rendered with consistent self-attention against them. With
    ref_images (+ PhotoMaker id_encoder), identity additionally comes from
    the reference photos — the general_prompt must contain the trigger word
    after the class word, e.g. "a man img" (StoryDiffusion "Using Ref
    Images")."""
    prompts = [f"{general_prompt}, {p}" for p in prompt_array]
    id_prompts = prompts[:id_length]
    if len(id_prompts) < id_length:
        id_prompts = id_prompts + [general_prompt] * (id_length - len(id_prompts))
    all_prompts = id_prompts + prompts[id_length:]
    styled, negative = apply_style(style_name, all_prompts)
    images = pipe(styled, negative_prompt=negative,
                  num_inference_steps=num_inference_steps,
                  id_length=id_length, sa_ratio=sa_ratio, seed=seed,
                  height=height, width=width, ref_images=ref_images,
                  id_encoder=id_encoder, id_params=id_params,
                  trigger_word=trigger_word)
    # One image per story prompt; id images ARE the first frames (the
    # reference's write-phase outputs are returned as story frames too).
    return [images[i] for i in range(len(prompts))]


def build_tiny_sdxl(tokenizer=None, rng=None) -> StoryXLPipeline:
    from spider_tpu.models.clip_text import CLIPTextModel, clip_tiny
    from spider_tpu.models.tokenizer import TinyTokenizer
    from spider_tpu.models.unet2d import unet_tiny
    from spider_tpu.models.vae import vae_tiny
    import dataclasses as dc

    from spider_tpu.models.factory import random_params_like

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    t1 = clip_tiny(vocab_size=max(len(tokenizer), 300))
    t2 = dc.replace(clip_tiny(vocab_size=max(len(tokenizer), 300)),
                    hidden_size=48, intermediate_size=96, projection_dim=48)
    enc1 = CLIPTextModel(t1)
    p1 = random_params_like(enc1, rng, jnp.zeros((1, 77), jnp.int32))
    enc2 = CLIPTextModel(t2)
    p2 = random_params_like(enc2, rng, jnp.zeros((1, 77), jnp.int32))
    ucfg = unet_tiny(cross_attention_dim=t1.hidden_size + t2.hidden_size,
                     addition_embed_type="text_time",
                     projection_dim=48 + 8 * 6)
    unet = UNet2DConditionModel(ucfg)
    up = random_params_like(
        unet, rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        dict(text_embeds=jnp.zeros((1, 48)),
             time_ids=jnp.zeros((1, 6), jnp.float32)))
    vcfg = vae_tiny()
    vae = AutoencoderKL(vcfg)
    vp = random_params_like(vae, rng, jnp.zeros((1, 16, 16, 3)))
    return StoryXLPipeline(tokenizer, tokenizer, enc1, p1, enc2, p2,
                           unet, up, vae, vp, height=16, width=16)
