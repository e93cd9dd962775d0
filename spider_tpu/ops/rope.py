"""Rotary position embeddings (RoPE) with Llama-3 frequency scaling.

Functional: precompute inv_freq once; apply per-call with integer positions so
the same code path serves prefill (positions 0..T) and KV-cached decode
(position = cache offset)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float = 10000.0,
                  llama3_scaling: Optional[dict] = None) -> jnp.ndarray:
    """Inverse frequencies, optionally with Llama-3.1-style NTK scaling.

    llama3_scaling keys: factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if llama3_scaling:
        factor = llama3_scaling["factor"]
        low = llama3_scaling["low_freq_factor"]
        high = llama3_scaling["high_freq_factor"]
        orig = llama3_scaling["original_max_position_embeddings"]
        low_wavelen = orig / low
        high_wavelen = orig / high
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (orig / wavelen - low) / (high - low)
        scaled = jnp.where(
            wavelen > low_wavelen,
            inv_freq / factor,
            jnp.where(
                wavelen < high_wavelen,
                inv_freq,
                (1.0 - smooth) / factor * inv_freq + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    return inv_freq


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (x[..., :d/2], x[..., d/2:]) — HF Llama convention.

    x: [..., T, num_heads, head_dim]; positions: broadcastable to [..., T].
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, d/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, d/2]
    sin = jnp.sin(angles)[..., None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    x1f = x1.astype(jnp.float32)
    x2f = x2.astype(jnp.float32)
    out1 = x1f * cos - x2f * sin
    out2 = x2f * cos + x1f * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def apply_mrope(x: jnp.ndarray, positions: jnp.ndarray,
                inv_freq: jnp.ndarray, section) -> jnp.ndarray:
    """Multimodal 3-D RoPE (Qwen2-VL / Qwen2.5-Omni).

    Each frequency index (of head_dim/2) is assigned to one of three
    position streams — temporal, height, width — by `section`
    (e.g. (16, 24, 24) for head_dim 128). Text tokens carry identical
    t/h/w positions, reducing exactly to standard RoPE.

    x: [B, T, H, D]; positions: [3, B, T] int; section sums to D/2.
    Matches transformers' apply_multimodal_rotary_pos_emb
    (qwen2_5_omni/modeling_qwen2_5_omni.py) in the HF rotate-half
    convention.
    """
    d2 = x.shape[-1] // 2
    assert sum(section) == d2, (section, d2)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [3,B,T,d2]
    sel = jnp.repeat(jnp.arange(3), jnp.asarray(section),
                     total_repeat_length=d2)                      # [d2]
    onehot = jax.nn.one_hot(sel, 3, dtype=jnp.float32)            # [d2, 3]
    ang = jnp.einsum("sbtd,ds->btd", angles, onehot)
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1, x2 = x[..., :d2], x[..., d2:]
    x1f = x1.astype(jnp.float32)
    x2f = x2.astype(jnp.float32)
    out1 = x1f * cos - x2f * sin
    out2 = x2f * cos + x1f * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
