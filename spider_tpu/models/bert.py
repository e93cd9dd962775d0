"""BERT encoder (flax) — Grounding DINO's language model
(cf. /root/reference/spider/models/mmdetection/mmdet/models/language_models/
bert.py, which wraps HF bert-base-uncased). Structured for HF weight
conversion: embeddings (word/position/token_type + LN), post-LN layers,
optional pooler."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.ops.attention import mha_reference


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32


def bert_base() -> BertConfig:
    return BertConfig()


def bert_test() -> BertConfig:
    return BertConfig(vocab_size=300, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, kv_len):
        cfg = self.config
        H = cfg.num_attention_heads
        B, T, C = x.shape
        D = C // H
        q = nn.Dense(C, dtype=cfg.dtype, name="query")(x)
        k = nn.Dense(C, dtype=cfg.dtype, name="key")(x)
        v = nn.Dense(C, dtype=cfg.dtype, name="value")(x)
        attn = mha_reference(q.reshape(B, T, H, D), k.reshape(B, T, H, D),
                             v.reshape(B, T, H, D), causal=False, kv_len=kv_len)
        h = nn.Dense(C, dtype=cfg.dtype, name="attn_out")(attn.reshape(B, T, C))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="attn_ln")(x + h)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate")(x)
        h = nn.Dense(C, dtype=cfg.dtype, name="output")(jax.nn.gelu(h))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="out_ln")(x + h)


class BertModel(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 token_type_ids: Optional[jnp.ndarray] = None):
        cfg = self.config
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                     name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=cfg.dtype, name="position_embeddings")(
            jnp.broadcast_to(jnp.arange(T)[None], (B, T)))
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="embed_ln")(x + pos + typ)
        kv_len = None
        if attention_mask is not None:
            kv_len = attention_mask.sum(-1).astype(jnp.int32)
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, kv_len)
        pooled = jnp.tanh(nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                   name="pooler")(x[:, 0]))
        return x, pooled
