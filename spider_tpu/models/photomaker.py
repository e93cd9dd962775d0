"""PhotoMaker ID encoder + ref-image ("Using Ref Images") story mode.

TPU-native counterpart of the reference's
/root/reference/StoryDiffusion/utils/model.py (PhotoMakerIDEncoder = CLIP
ViT-L/14 vision tower + dual visual projections 768/1280 → 2048 + FuseModule)
and utils/pipeline.py:31 (PhotoMakerStableDiffusionXLPipeline's trigger-word
prompt surgery: the trigger token is removed, the class word before it is
repeated once per id image, and those positions' prompt embeddings are fused
with the stacked id embeddings).

Differences from the torch implementation, by design:
- the fuse scatter is expressed statically: a [B,77] class-token mask plus a
  cumsum position→id-image map select rows, and `jnp.where` writes the fused
  embeddings back — no boolean masked_scatter_ (dynamic shapes don't jit);
- the vision tower is one jitted forward over the stacked id images.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PhotoMakerConfig:
    # CLIP vision tower (utils/model.py VISION_CONFIG_DICT)
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 768          # visual_projection
    projection_dim_2: int = 1280       # visual_projection_2
    embed_dim: int = 2048              # SDXL prompt-embed dim (768+1280)
    dtype: Any = jnp.float32


def photomaker_v1() -> PhotoMakerConfig:
    return PhotoMakerConfig()


def photomaker_tiny(embed_dim: int = 80, proj1: int = 32,
                    proj2: int = 48) -> PhotoMakerConfig:
    return PhotoMakerConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            patch_size=8, image_size=32,
                            projection_dim=proj1, projection_dim_2=proj2,
                            embed_dim=embed_dim)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _VisionBlock(nn.Module):
    heads: int
    dtype: Any
    intermediate: int = 0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(h)
        from spider_tpu.models.unet2d import _attention
        x = x + nn.Dense(C, dtype=self.dtype, name="out_proj")(
            _attention(q, k, v, self.heads))
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(C, dtype=self.dtype, name="fc2")(_quick_gelu(h))


class CLIPVisionTower(nn.Module):
    """HF CLIPVisionModel forward: patch conv → cls+pos → pre-LN → blocks →
    post-LN(cls) pooled output."""

    config: PhotoMakerConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels [N, H, W, 3] (CLIP-normalized) → pooled [N, hidden]."""
        cfg = self.config
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=cfg.dtype, name="patch_embedding")(
            pixels.astype(cfg.dtype))
        N = x.shape[0]
        x = x.reshape(N, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (N, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], cfg.hidden_size), jnp.float32)
        x = x + pos.astype(cfg.dtype)[None]
        x = nn.LayerNorm(dtype=cfg.dtype, name="pre_layrnorm")(x)
        for i in range(cfg.num_hidden_layers):
            x = _VisionBlock(cfg.num_attention_heads, cfg.dtype,
                             intermediate=cfg.intermediate_size,
                             name=f"layers_{i}")(x)
        return nn.LayerNorm(dtype=cfg.dtype, name="post_layernorm")(x[:, 0])


class _FuseMLP(nn.Module):
    out_dim: int
    hidden_dim: int
    use_residual: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        res = x
        x = nn.LayerNorm(dtype=self.dtype, name="layernorm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     name="fc2")(jax.nn.gelu(x))
        return x + res if self.use_residual else x


class FuseModule(nn.Module):
    """fuse_fn of utils/model.py: LN(MLP2(MLP1(cat(prompt,id)) + prompt))."""

    embed_dim: int
    dtype: Any

    @nn.compact
    def __call__(self, prompt_embeds, id_embeds):
        """prompt_embeds [..., D], id_embeds [..., D] → fused [..., D]."""
        d = self.embed_dim
        x = jnp.concatenate([prompt_embeds, id_embeds], axis=-1)
        x = _FuseMLP(d, d, False, self.dtype, name="mlp1")(x) + prompt_embeds
        x = _FuseMLP(d, d, True, self.dtype, name="mlp2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)


class PhotoMakerIDEncoder(nn.Module):
    config: PhotoMakerConfig

    @nn.compact
    def __call__(self, id_pixels, prompt_embeds, class_mask):
        """id_pixels [N_id, H, W, 3]; prompt_embeds [B, 77, embed_dim];
        class_mask [B, 77] int32 — 0 where untouched, k>0 meaning "fuse with
        id image k-1" (the k-th duplicated class token; the host-side
        prompt surgery in `prompts_with_trigger` builds it)."""
        cfg = self.config
        pooled = CLIPVisionTower(cfg, name="vision_model")(id_pixels)
        e1 = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                      name="visual_projection")(pooled)
        e2 = nn.Dense(cfg.projection_dim_2, use_bias=False, dtype=cfg.dtype,
                      name="visual_projection_2")(pooled)
        id_embeds = jnp.concatenate([e1, e2], axis=-1)    # [N_id, embed_dim]
        # position → id image: class_mask k>0 selects id_embeds[k-1]
        sel = jnp.take(id_embeds, jnp.maximum(class_mask - 1, 0),
                       axis=0)                            # [B, 77, embed_dim]
        fused = FuseModule(cfg.embed_dim, cfg.dtype, name="fuse_module")(
            prompt_embeds, sel.astype(prompt_embeds.dtype))
        return jnp.where((class_mask > 0)[..., None], fused, prompt_embeds)


# --------------------------------------------------------------- host helpers

def prompts_with_trigger(tokenizer, prompts: Sequence[str], trigger_word: str,
                         num_id_images: int, max_len: int, eos: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """The reference pipeline's encode_prompt_with_trigger_word surgery
    (utils/pipeline.py): remove the trigger token(s), repeat the class token
    right before it once per id image, and mark those positions.

    Returns (ids [B, max_len] int32, class_mask [B, max_len] int32) where
    class_mask is 0 outside fused positions and k at the position fused with
    id image k-1. Works for multi-token trigger words (byte-level test
    tokenizers) by matching the trigger's full id subsequence."""
    trig = list(tokenizer(trigger_word, add_special_tokens=False).input_ids)
    assert trig, "trigger word tokenizes to nothing"
    ids_out, mask_out = [], []
    for p in prompts:
        ids = list(tokenizer(p, add_special_tokens=True).input_ids)
        clean: List[int] = []
        mask: List[int] = []
        i = 0
        while i < len(ids):
            if ids[i: i + len(trig)] == trig and clean:
                cls_tok = clean.pop()
                mask.pop()
                for k in range(num_id_images):
                    clean.append(cls_tok)
                    mask.append(k + 1)
                i += len(trig)
            else:
                clean.append(ids[i])
                mask.append(0)
                i += 1
        clean = clean[: max_len - 1] + [eos]
        mask = mask[: max_len - 1] + [0]
        clean += [eos] * (max_len - len(clean))
        mask += [0] * (max_len - len(mask))
        ids_out.append(clean)
        mask_out.append(mask)
    return (np.asarray(ids_out, np.int32), np.asarray(mask_out, np.int32))


def preprocess_id_images(images: Sequence[np.ndarray],
                         size: int) -> jnp.ndarray:
    """uint8/float HWC images → CLIP-normalized [N, size, size, 3]."""
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    out = []
    for im in images:
        a = np.asarray(im)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 255.0
        # nearest resize (host-side; id conditioning is resolution-tolerant)
        ys = (np.arange(size) * a.shape[0] / size).astype(np.int32)
        xs = (np.arange(size) * a.shape[1] / size).astype(np.int32)
        a = a[ys][:, xs, :3]
        out.append((a - mean) / std)
    return jnp.asarray(np.stack(out), jnp.float32)


def build_tiny_photomaker(embed_dim: int = 80, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cfg = photomaker_tiny(embed_dim=embed_dim, proj1=embed_dim - 48,
                          proj2=48)
    enc = PhotoMakerIDEncoder(cfg)
    params = enc.init(rng,
                      jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                      jnp.zeros((1, 77, cfg.embed_dim)),
                      jnp.zeros((1, 77), jnp.int32))
    return enc, params


def build_full_photomaker(rng=None):
    """PhotoMaker-v1-sized ID encoder (random init, bf16); weight conversion
    drops the real id_encoder state dict into the same tree
    (models/convert.py::convert_photomaker_state_dict)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cfg = dataclasses.replace(photomaker_v1(), dtype=jnp.bfloat16)
    enc = PhotoMakerIDEncoder(cfg)
    from spider_tpu.models.factory import random_params_like
    params = random_params_like(
        enc, rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 77, cfg.embed_dim)), jnp.zeros((1, 77), jnp.int32))
    return enc, params
