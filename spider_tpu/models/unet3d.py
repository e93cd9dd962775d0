"""Conditional 3-D UNet (flax) — text-to-video denoiser (ZeroScope /
TextToVideoSD class; cf. /root/reference/spider/models/custom_vd.py).

Layout [B, F, H, W, C]: spatial ops fold frames into the batch; temporal ops
fold pixels into the batch over F. Block structure mirrors diffusers'
UNet3DConditionModel one-to-one (resnets / temp_convs / attentions /
temp_attentions + a stem temporal transformer) so ZeroScope checkpoints
convert directly (spider_tpu.models.convert.convert_unet3d_state_dict).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.schedulers import timestep_embedding
from spider_tpu.models.unet2d import (ResnetBlock2D, Transformer2D,
                                      _attention)


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


class _ShiftConvF(nn.Module):
    """Kernel-3 conv over the frame axis as shift + three [C,C] matmuls —
    the MXU-native form of nn.Conv((3,1)) on [B, F, P, C] (+0.6 ms/layer
    measured at the ZeroScope level-0 shape: XLA lowers the (3,1) conv to
    a general conv; the shifted matmuls hit the batched-GEMM path
    directly). Param tree is IDENTICAL to nn.Conv (kernel [3,1,Cin,Cout],
    bias [Cout]) so converters/checkpoints are unaffected."""

    channels: int
    dtype: Any
    zero_init: bool = False

    @nn.compact
    def __call__(self, h):
        C = h.shape[-1]
        kinit = nn.initializers.zeros if self.zero_init \
            else nn.initializers.lecun_normal()
        kernel = self.param("kernel", kinit, (3, 1, C, self.channels),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.channels,), jnp.float32)
        k = kernel.astype(self.dtype)[:, 0]              # [3, Cin, Cout]
        h = h.astype(self.dtype)
        prev = jnp.pad(h[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(h[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        y = prev @ k[0] + h @ k[1] + nxt @ k[2]
        return y + bias.astype(self.dtype)


class TemporalConv(nn.Module):
    """diffusers TemporalConvLayer: 4 x (GroupNorm -> SiLU -> conv over F),
    residual, last conv zero-init (identity at init).

    Runs in [B, F, H*W, C] layout with the frame-axis conv expressed as
    shift+matmul (_ShiftConvF) — no pixel-major transposes (two ~60 MB HBM
    round-trips per block at the ZeroScope level-0 shape), and GroupNorm
    statistics reduce over (F, H, W, C/g) per batch sample, matching torch
    GroupNorm on [B, C, F, H, W] exactly (the transposed per-pixel layout
    silently normalized per (b,h,w) over (F, C/g))."""

    channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        h = x.reshape(B, F, H * W, C)
        for i in range(1, 5):
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.silu(h)
            h = _ShiftConvF(self.channels, self.dtype, zero_init=(i == 4),
                            name=f"conv{i}")(h)
        return x + h.reshape(B, F, H, W, C)


class TemporalBasicBlock(nn.Module):
    """BasicTransformerBlock over the frame axis (attn1 + attn2 both
    self-attention here — diffusers passes no temporal context).

    Input is [B, F, P, C] (layout="bfpc") or [B, P, F, C] ("bpfc" —
    pixel-major, lets the Pallas attention fold frames with a free
    reshape); every sub-op is last-dim so the block is layout-agnostic.
    The frame-axis attention core routes through ops.temporal_attention —
    the (head, frame)-folded masked full-tile formulation that replaced
    ~46k tiny einsum matmuls per call."""

    heads: int
    dtype: Any
    layout: str = "bfpc"

    @nn.compact
    def __call__(self, h):
        from spider_tpu.ops.temporal_attention import temporal_attention

        C = h.shape[-1]
        nh = self.heads

        def attn(name, x):
            q = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         name=f"{name}_q")(x)
            k = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         name=f"{name}_k")(x)
            v = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         name=f"{name}_v")(x)
            out = temporal_attention(q, k, v, nh, layout=self.layout)
            return nn.Dense(C, dtype=self.dtype, name=f"{name}_out")(out)

        h = h + attn("attn1", nn.LayerNorm(dtype=self.dtype, name="norm1")(h))
        h = h + attn("attn2", nn.LayerNorm(dtype=self.dtype, name="norm2")(h))
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(h)
        a, b = jnp.split(nn.Dense(C * 8, dtype=self.dtype,
                                  name="ff_proj_in")(y), 2, axis=-1)
        return h + nn.Dense(C, dtype=self.dtype, name="ff_proj_out")(
            a * jax.nn.gelu(b))


class TransformerTemporal(nn.Module):
    """diffusers TransformerTemporalModel: GroupNorm -> proj_in -> blocks
    over frames -> proj_out, residual. Runs in [B, F, H*W, C] layout (see
    TemporalBasicBlock); GroupNorm reduces over (F, H, W, C/g) per batch
    sample, matching torch GroupNorm on the [B, C, F, H, W] view."""

    heads: int
    groups: int
    dtype: Any
    depth: int = 1

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        residual = x
        h = x.reshape(B, F, H * W, C)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(h)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        # Layout note (measured, round 4): running the blocks pixel-major
        # ([B, HW, F, C], layout="bpfc" — one transpose in/out instead of a
        # fold-transpose around every attention core) REGRESSED the full
        # step 301.7 -> 307.6 ms: XLA fuses the per-call 5D folds into the
        # projection epilogues better than it handles the standalone
        # module-level transpose. Frame-major stays.
        for i in range(self.depth):
            h = TemporalBasicBlock(self.heads, self.dtype,
                                   name=f"block_{i}")(h)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return residual + h.reshape(B, F, H, W, C)


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
        # stem temporal transformer (diffusers transformer_in)
        x = _fold_frames(TransformerTemporal(
            cfg.num_attention_heads[0], cfg.norm_num_groups, cfg.dtype,
            name="transformer_in")(_unfold_frames(x, bf)))[0]
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
        x = _fold_frames(TemporalConv(ch, cfg.norm_num_groups, cfg.dtype,
                                      name="mid_tconv_0")(
            _unfold_frames(x, bf)))[0]
        x = Transformer2D(cfg.num_attention_heads[-1], 1, cfg.norm_num_groups,
                          cfg.dtype, name="mid_attn")(x, ctx_f)
        x = _fold_frames(TransformerTemporal(
            cfg.num_attention_heads[-1], cfg.norm_num_groups, cfg.dtype,
            name="mid_tattn")(_unfold_frames(x, bf)))[0]
        x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                          name="mid_res_1")(x, temb_f)
        x = _fold_frames(TemporalConv(ch, cfg.norm_num_groups, cfg.dtype,
                                      name="mid_tconv_1")(
            _unfold_frames(x, bf)))[0]

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
