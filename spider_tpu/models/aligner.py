"""Standalone Kosmos-G-style aligner (reference:
spider/models/aligner.py:11-103 — present but unwired in the reference's
live path; SURVEY.md §2.1 marks it optional).

Maps LLM hidden-state sequences into CLIP text-encoder space with a
77-query cross-attention bottleneck, supervised by (a) MSE against the
frozen CLIP text embeddings and (b) a reconstruction branch decoding the
77 queries back to the input sequence. TPU-native: flax modules over the
shared EncDecTransformer blocks in models/aligners.py; the frozen CLIP
encoder comes from models/clip_text.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.aligners import EncDecTransformer


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    llm_dim: int = 4096            # decoder_embed_dim of the LLM
    clip_dim: int = 768            # CLIP text width
    num_queries: int = 77
    max_positions: int = 1024      # reference uses 32768; serving needs less
    dtype: Any = jnp.float32


class Aligner(nn.Module):
    """forward(condition [B,T,llm_dim], clip_embed [B,77,clip_dim]) ->
    {'mse_loss', 'rec_loss'} (clip_embed precomputed by the frozen CLIP
    encoder — the reference holds CLIPTextModel inside and no-grads it)."""

    config: AlignerConfig

    @nn.compact
    def __call__(self, condition: jnp.ndarray,
                 clip_embed: Optional[jnp.ndarray] = None,
                 padding_mask: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        B, T, _ = condition.shape
        x = nn.Dense(cfg.clip_dim, dtype=cfg.dtype, name="in_proj")(
            condition.astype(cfg.dtype))
        pos = self.param("positions", nn.initializers.normal(0.02),
                         (cfg.max_positions, cfg.clip_dim), jnp.float32)
        x = x + pos[None, :T].astype(cfg.dtype)
        if padding_mask is not None:
            x = x * (1.0 - padding_mask[..., None].astype(x.dtype))

        # encoder: 77 learned queries cross-attend into the projected
        # sequence (torchscale Encoder+Decoder pair in the reference)
        enc_q = self.param("encoder_query", nn.initializers.normal(1.0),
                           (cfg.num_queries, cfg.clip_dim), jnp.float32)
        queries = jnp.broadcast_to(enc_q[None].astype(cfg.dtype),
                                   (B, cfg.num_queries, cfg.clip_dim))
        aligned = EncDecTransformer(dtype=cfg.dtype, name="encoder")(
            x, queries)

        out: Dict[str, jnp.ndarray] = {"aligned": aligned}
        if clip_embed is not None:
            out["mse_loss"] = jnp.mean(
                (aligned.astype(jnp.float32)
                 - clip_embed.astype(jnp.float32)) ** 2)

        # reconstruction branch: T learned queries decode the 77 aligned
        # tokens back into the input space (rec_loss scaled 77/T as the
        # reference does)
        dec_q = self.param("decoder_query", nn.initializers.normal(1.0),
                           (cfg.max_positions, cfg.clip_dim), jnp.float32)
        rq = jnp.broadcast_to(dec_q[None, :T].astype(cfg.dtype),
                              (B, T, cfg.clip_dim))
        rec = EncDecTransformer(dtype=cfg.dtype, name="decoder")(aligned, rq)
        rec = nn.Dense(cfg.llm_dim, dtype=cfg.dtype, name="out_proj")(rec)
        out["rec_loss"] = jnp.mean(
            (rec.astype(jnp.float32) - condition.astype(jnp.float32)) ** 2
        ) * (cfg.num_queries / T)
        return out


class AlignerEncoder(nn.Module):
    """Inference-only half (reference Aligner_encoder): sequence -> 77
    aligned tokens."""

    config: AlignerConfig

    @nn.compact
    def __call__(self, condition: jnp.ndarray,
                 padding_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        B, T, _ = condition.shape
        x = nn.Dense(cfg.clip_dim, dtype=cfg.dtype, name="in_proj")(
            condition.astype(cfg.dtype))
        pos = self.param("positions", nn.initializers.normal(0.02),
                         (cfg.max_positions, cfg.clip_dim), jnp.float32)
        x = x + pos[None, :T].astype(cfg.dtype)
        if padding_mask is not None:
            x = x * (1.0 - padding_mask[..., None].astype(x.dtype))
        enc_q = self.param("encoder_query", nn.initializers.normal(1.0),
                           (cfg.num_queries, cfg.clip_dim), jnp.float32)
        queries = jnp.broadcast_to(enc_q[None].astype(cfg.dtype),
                                   (B, cfg.num_queries, cfg.clip_dim))
        return EncDecTransformer(dtype=cfg.dtype, name="encoder")(x, queries)
