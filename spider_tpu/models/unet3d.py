"""Conditional 3-D UNet (flax) — text-to-video denoiser (ZeroScope /
TextToVideoSD class; cf. /root/reference/spider/models/custom_vd.py).

Layout [B, F, H, W, C]: spatial ops fold frames into the batch; temporal ops
(1-D conv + temporal self-attention) fold pixels into the batch. This mirrors
the factorized spatio-temporal design of diffusers' UNet3DConditionModel while
staying XLA-friendly (static folds, no python loops over frames).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.schedulers import timestep_embedding
from spider_tpu.models.unet2d import (BasicTransformerBlock, ResnetBlock2D,
                                      Transformer2D, _attention)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    dtype: Any = jnp.float32


def unet3d_zeroscope() -> UNet3DConfig:
    return UNet3DConfig()


def unet3d_tiny(cross_attention_dim: int = 32) -> UNet3DConfig:
    return UNet3DConfig(block_out_channels=(16, 32),
                        cross_attn_blocks=(True, True), layers_per_block=1,
                        num_attention_heads=(2, 2),
                        cross_attention_dim=cross_attention_dim,
                        norm_num_groups=4)


def _fold_frames(x):
    B, F, H, W, C = x.shape
    return x.reshape(B * F, H, W, C), (B, F)


def _unfold_frames(x, bf):
    B, F = bf
    _, H, W, C = x.shape
    return x.reshape(B, F, H, W, C)


class TemporalConv(nn.Module):
    channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        """x: [B, F, H, W, C]; conv over F. Zero-init output conv => identity
        at init (diffusers TemporalConvLayer convention)."""
        B, F, H, W, C = x.shape
        h = x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        h = h.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4)
        return x + h


class TransformerTemporal(nn.Module):
    heads: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        """Temporal self-attention over frames; zero-init out => identity."""
        B, F, H, W, C = x.shape
        h = x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")(h)
        att = _attention(q, k, v, self.heads)
        out = nn.Dense(C, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="to_out")(att)
        out = out.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4)
        return x + out


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray):
        """sample [B,F,H,W,Cin]; timesteps [B]; context [B,S,Dctx]."""
        cfg = self.config
        B, F = sample.shape[:2]
        tdim = cfg.block_out_channels[0] * 4
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = nn.Dense(tdim, dtype=cfg.dtype, name="time_embed_1")(temb)
        temb = nn.Dense(tdim, dtype=cfg.dtype, name="time_embed_2")(nn.silu(temb))
        temb_f = jnp.repeat(temb, F, axis=0)            # per folded frame
        ctx_f = jnp.repeat(encoder_hidden_states, F, axis=0)

        x, bf = _fold_frames(sample)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_in")(x)
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                                  name=f"down_{i}_res_{j}")(x, temb_f)
                x = _fold_frames(TemporalConv(ch, cfg.norm_num_groups, cfg.dtype,
                                              name=f"down_{i}_tconv_{j}")(
                    _unfold_frames(x, bf)))[0]
                if cfg.cross_attn_blocks[i]:
                    x = Transformer2D(cfg.num_attention_heads[i], 1,
                                      cfg.norm_num_groups, cfg.dtype,
                                      name=f"down_{i}_attn_{j}")(x, ctx_f)
                    x = _fold_frames(TransformerTemporal(
                        cfg.num_attention_heads[i], cfg.norm_num_groups,
                        cfg.dtype, name=f"down_{i}_tattn_{j}")(
                        _unfold_frames(x, bf)))[0]
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=cfg.dtype,
                            name=f"down_{i}_downsample")(x)
                skips.append(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                          name="mid_res_0")(x, temb_f)
        x = Transformer2D(cfg.num_attention_heads[-1], 1, cfg.norm_num_groups,
                          cfg.dtype, name="mid_attn")(x, ctx_f)
        x = _fold_frames(TransformerTemporal(
            cfg.num_attention_heads[-1], cfg.norm_num_groups, cfg.dtype,
            name="mid_tattn")(_unfold_frames(x, bf)))[0]
        x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                          name="mid_res_1")(x, temb_f)

        rev_channels = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.cross_attn_blocks))
        rev_heads = list(reversed(cfg.num_attention_heads))
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                                  name=f"up_{i}_res_{j}")(x, temb_f)
                x = _fold_frames(TemporalConv(ch, cfg.norm_num_groups, cfg.dtype,
                                              name=f"up_{i}_tconv_{j}")(
                    _unfold_frames(x, bf)))[0]
                if rev_attn[i]:
                    x = Transformer2D(rev_heads[i], 1, cfg.norm_num_groups,
                                      cfg.dtype, name=f"up_{i}_attn_{j}")(x, ctx_f)
                    x = _fold_frames(TransformerTemporal(
                        rev_heads[i], cfg.norm_num_groups, cfg.dtype,
                        name=f"up_{i}_tattn_{j}")(_unfold_frames(x, bf)))[0]
            if i < len(rev_channels) - 1:
                BF, H, W, C = x.shape
                x = jax.image.resize(x, (BF, H * 2, W * 2, C), method="nearest")
                x = nn.Conv(C, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=cfg.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_out")(x)
        return _unfold_frames(x, bf)
