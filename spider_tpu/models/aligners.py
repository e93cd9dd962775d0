"""Alignment projectors ("Decoders-Controller" alignment modules): map LLM
hidden states at signal-token positions into the conditioning spaces of the
frozen task decoders.

Re-implements /root/reference/spider/models/layers.py:26-335 in flax:
  * TextFcLayer — 'linear' | 'transformer' (4+4-layer enc-dec with learned
    query embeddings, 1->77 tokens) | 'qformer' (BERT-style cross-attn
    queries)
  * TextFcLayerMoE — 'moe_transformer' (3 experts x (fc + enc-dec), per-
    modality sigmoid routers + out_fc + learned modality query tokens,
    optional reconstruction branch) and 'moe_aligner' (Kosmos-G-style
    encoder/decoder with 77 cross-attn queries).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.unet2d import _attention


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)


class _SelfAttn(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, context=None):
        C = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(ctx)
        v = nn.Dense(C, dtype=self.dtype, name="v")(ctx)
        return nn.Dense(C, dtype=self.dtype, name="out")(
            _attention(q, k, v, self.heads))


class EncDecTransformer(nn.Module):
    """Pre-LN encoder-decoder (torch nn.Transformer(norm_first=True)
    equivalent): src -> memory; queries cross-attend to memory."""

    num_layers: int = 4
    heads: int = 4
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, queries):
        C = src.shape[-1]
        x = src
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"enc{i}_ln1")(x)
            x = x + _SelfAttn(self.heads, self.dtype, name=f"enc{i}_attn")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"enc{i}_ln2")(x)
            h = nn.Dense(C * self.ff_mult, dtype=self.dtype, name=f"enc{i}_fc1")(h)
            x = x + nn.Dense(C, dtype=self.dtype, name=f"enc{i}_fc2")(jax.nn.relu(h))
        memory = nn.LayerNorm(dtype=self.dtype, name="enc_ln_out")(x)

        y = jnp.broadcast_to(queries, (src.shape[0],) + queries.shape[-2:])
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"dec{i}_ln1")(y)
            y = y + _SelfAttn(self.heads, self.dtype, name=f"dec{i}_self")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"dec{i}_ln2")(y)
            y = y + _SelfAttn(self.heads, self.dtype, name=f"dec{i}_cross")(h, memory)
            h = nn.LayerNorm(dtype=self.dtype, name=f"dec{i}_ln3")(y)
            h = nn.Dense(C * self.ff_mult, dtype=self.dtype, name=f"dec{i}_fc1")(h)
            y = y + nn.Dense(C, dtype=self.dtype, name=f"dec{i}_fc2")(jax.nn.relu(h))
        return nn.LayerNorm(dtype=self.dtype, name="dec_ln_out")(y)


class QFormerBlock(nn.Module):
    """BERT-style block with self-attn over queries + cross-attn to encoder
    states (the stripped Q-Former of layers.py:76-96: no FFN)."""

    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, queries, enc_states):
        h = _SelfAttn(self.heads, self.dtype, name="self_attn")(queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln1")(queries + h)
        h = _SelfAttn(self.heads, self.dtype, name="cross_attn")(queries, enc_states)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(queries + h)


class TextFcLayer(nn.Module):
    """Maps (N, T_in, in_dim) -> (N, num_output_tokens, out_dim)."""

    in_dim: int
    out_dim: int
    num_input_tokens: int = 1
    num_output_tokens: int = 1
    mode: str = "transformer"      # 'linear' | 'transformer' | 'qformer'
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, modality: Optional[str] = None):
        if self.mode == "linear":
            out = nn.Dense(self.out_dim, dtype=self.dtype, name="model")(x)
            if out.shape[1] > self.num_output_tokens:
                out = out[:, : self.num_output_tokens]
            return out
        if self.mode == "transformer":
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x)
            queries = self.param(
                "query_embs", nn.initializers.normal(1.0),
                (1, self.num_output_tokens, self.hidden_dim), jnp.float32)
            h = EncDecTransformer(dtype=self.dtype, name="tfm")(
                h, queries.astype(self.dtype))
            return nn.Dense(self.out_dim, dtype=self.dtype, name="model")(h)
        if self.mode == "qformer":
            hidden = 768
            h = nn.Dense(hidden, dtype=self.dtype, name="fc")(x)
            queries = self.param(
                "query_tokens", nn.initializers.normal(0.02),
                (1, self.num_output_tokens, hidden), jnp.float32)
            q = jnp.broadcast_to(queries.astype(self.dtype),
                                 (x.shape[0], self.num_output_tokens, hidden))
            for i in range(2):
                q = QFormerBlock(12, self.dtype, name=f"qformer_{i}")(q, h)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="model")(q)
        raise NotImplementedError(self.mode)


class TextFcLayerMoE(nn.Module):
    """Shared-expert MoE aligner serving all modalities from one module.

    output_alignment_modules: {modality: dict(alignment_output_tokens,
    alignment_output_dim, ...)} — mirrors Spider's config blob
    (spider.py:109-120).
    """

    in_dim: int
    output_alignment_modules: Dict[str, Dict]
    mode: str = "moe_transformer"  # or 'moe_aligner'
    reconstruct_loss: bool = False
    num_experts: int = 3
    num_expert_layers: int = 4
    hidden_dim: int = 512
    num_rec_tokens: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, modality: str = "IMAGE"):
        mods = self.output_alignment_modules
        if self.mode == "moe_transformer":
            num_out = mods[modality]["alignment_output_tokens"]
            out_dim = mods[modality]["alignment_output_dim"]
            # router: [b,T,in] -> [b,1,E] normalized sigmoid weights
            x_router = x.mean(axis=1, keepdims=True)
            w = Mlp(self.in_dim, self.num_experts, self.dtype,
                    name=f"router_{modality}")(x_router)
            w = jax.nn.sigmoid(w)
            w = w / w.sum(axis=-1, keepdims=True)          # [b,1,E]
            queries = self.param(
                f"modality_tokens_{modality}", nn.initializers.normal(1.0),
                (1, num_out, self.hidden_dim), jnp.float32)
            expert_outs = []
            for e in range(self.num_experts):
                h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                             name=f"expert_fc_{e}")(x)
                h = EncDecTransformer(self.num_expert_layers, dtype=self.dtype,
                                      name=f"expert_tfm_{e}")(
                    h, queries.astype(self.dtype))
                expert_outs.append(h * w[:, :, e:e + 1])   # [b,1,1] weight
            h = sum(expert_outs)                            # [b,num_out,hidden]
            out = nn.Dense(out_dim, dtype=self.dtype,
                           name=f"out_fc_{modality}")(h)
            if not self.reconstruct_loss:
                return out
            # Reconstruction branch: project back toward the LLM embedding
            # space (layers.py:283-308).
            num_tokens = x.shape[1]
            if num_tokens > self.num_rec_tokens and self.num_rec_tokens != 1:
                return out, x
            r = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         name=f"rec_out_fc_{modality}")(out)
            r_router = r.mean(axis=1, keepdims=True)
            rw = Mlp(self.hidden_dim, self.num_experts, self.dtype,
                     name=f"rec_router_{modality}")(r_router)
            rw = jax.nn.sigmoid(rw)
            rw = rw / rw.sum(axis=-1, keepdims=True)
            rec_tokens = self.param(
                f"rec_modality_tokens_{modality}", nn.initializers.normal(1.0),
                (self.num_rec_tokens, self.hidden_dim), jnp.float32)
            if self.num_rec_tokens == 1:
                rq = jnp.tile(rec_tokens, (num_tokens, 1))[None]
            else:
                rq = rec_tokens[:num_tokens][None]
            rec_outs = []
            for e in range(self.num_experts):
                h = EncDecTransformer(self.num_expert_layers, dtype=self.dtype,
                                      name=f"rec_expert_tfm_{e}")(
                    r, rq.astype(self.dtype))
                rec_outs.append(h * rw[:, :, e:e + 1])
            rec = sum(rec_outs)
            rec = nn.Dense(self.in_dim, dtype=self.dtype,
                           name=f"rec_out_fc2_{modality}")(rec)
            return out, rec
        if self.mode == "moe_aligner":
            hidden = 768
            num_out = 77
            h = nn.Dense(hidden, dtype=self.dtype, name="encoder_proj")(x)
            queries = self.param("encoder_query", nn.initializers.normal(1.0),
                                 (1, num_out, hidden), jnp.float32)
            out = EncDecTransformer(6, heads=8, dtype=self.dtype,
                                    name="aligner")(h, queries.astype(self.dtype))
            if not self.reconstruct_loss:
                return out
            dq = self.param("decoder_query", nn.initializers.normal(1.0),
                            (1, 1024, hidden), jnp.float32)
            num_tokens = x.shape[1]
            rec = EncDecTransformer(6, heads=8, dtype=self.dtype,
                                    name="rec_decoder")(
                out, dq[:, :num_tokens].astype(self.dtype))
            rec = nn.Dense(self.in_dim, dtype=self.dtype,
                           name="decoder_proj")(rec)
            return out, rec
        raise NotImplementedError(self.mode)
