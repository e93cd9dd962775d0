"""CLIP-family text encoders (flax) — the conditioning backbones of the task
decoders: SD-1.5 uses CLIP ViT-L/14 (768-d), ZeroScope CLIP ViT-H (1024-d),
SDXL CLIP-L + OpenCLIP bigG (1280-d, penultimate layer + pooled), AudioLDM a
CLAP text branch (512-d projection). The reference reaches these through
diffusers' pipelines with the `return_prompts_only` patch exposing the
text-conditioning embeddings as alignment targets
(cf. /root/reference/spider/models/custom_sd.py:497,590-604)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.ops.attention import mha_reference


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"      # openclip bigG uses "gelu"
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # text_projection output (pooled)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def clip_vit_l14() -> CLIPTextConfig:
    return CLIPTextConfig()


def clip_vit_h14() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=1024, intermediate_size=4096,
                          num_hidden_layers=23, num_attention_heads=16)


def open_clip_bigg() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=1280, intermediate_size=5120,
                          num_hidden_layers=32, num_attention_heads=20,
                          hidden_act="gelu", projection_dim=1280)


def clip_tiny(vocab_size: int = 1000) -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=vocab_size, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, max_position_embeddings=77,
                          projection_dim=32, eos_token_id=2)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        H = cfg.num_attention_heads
        D = cfg.hidden_size // H
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm1")(x)
        B, T, _ = y.shape
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q_proj")(y)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k_proj")(y)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v_proj")(y)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        attn = mha_reference(q, k, v, causal=True)  # CLIP text is causal
        attn = attn.reshape(B, T, cfg.hidden_size)
        x = residual + nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                name="out_proj")(attn)
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(y)
        y = _act(cfg.hidden_act)(y)
        y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class CLIPTextModel(nn.Module):
    """Returns (last_hidden, all_hidden [L+1], pooled)."""

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.config
        B, T = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         cfg.param_dtype)
        x = tok + pos[None, :T].astype(cfg.dtype)
        hiddens = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x)
            hiddens.append(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_layer_norm")(x)
        # Pooled: state at each sequence's EOS token (HF convention).
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)[:, 0]
        if cfg.projection_dim:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=cfg.dtype, name="text_projection")(pooled)
        return x, jnp.stack(hiddens, axis=0), pooled


@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    """CLAP text branch (RoBERTa-style bidirectional encoder + projection) —
    AudioLDM's prompt conditioning (512-d pooled)."""
    vocab_size: int = 50265
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 514
    projection_dim: int = 512
    dtype: Any = jnp.float32


def clap_tiny(vocab_size: int = 1000) -> ClapTextConfig:
    return ClapTextConfig(vocab_size=vocab_size, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, projection_dim=16)


class ClapTextModel(nn.Module):
    config: ClapTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        B, T = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = x + pos[None, :T].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=cfg.dtype, name="embed_ln")(x)
        H = cfg.num_attention_heads
        D = cfg.hidden_size // H
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), dtype=jnp.int32)
        kv_len = attention_mask.sum(axis=-1).astype(jnp.int32)
        for i in range(cfg.num_hidden_layers):
            residual = x
            q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=f"l{i}_q")(x)
            k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=f"l{i}_k")(x)
            v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=f"l{i}_v")(x)
            attn = mha_reference(q.reshape(B, T, H, D), k.reshape(B, T, H, D),
                                 v.reshape(B, T, H, D), causal=False,
                                 kv_len=kv_len)
            x = residual + nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                    name=f"l{i}_out")(attn.reshape(B, T, -1))
            x = nn.LayerNorm(epsilon=1e-12, dtype=cfg.dtype, name=f"l{i}_ln1")(x)
            residual = x
            y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name=f"l{i}_fc1")(x)
            y = jax.nn.gelu(y)
            y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=f"l{i}_fc2")(y)
            x = nn.LayerNorm(epsilon=1e-12, dtype=cfg.dtype, name=f"l{i}_ln2")(x + y)
        # CLAP pools the first token then projects with a 2-layer MLP.
        pooled = x[:, 0]
        p = nn.Dense(cfg.projection_dim, dtype=cfg.dtype, name="proj_fc1")(pooled)
        p = jax.nn.relu(p)
        p = nn.Dense(cfg.projection_dim, dtype=cfg.dtype, name="proj_fc2")(p)
        return x, p
