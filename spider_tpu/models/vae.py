"""AutoencoderKL (flax) — the latent codec shared by SD-1.5 / SDXL /
ZeroScope (per-frame) and, in 1-channel mel form, AudioLDM.

Channel-last layout (NHWC) throughout — TPU conv layout; converters transpose
HF's NCHW weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215     # SDXL: 0.13025
    dtype: Any = jnp.float32


def vae_sd() -> VAEConfig:
    return VAEConfig()


def vae_sdxl() -> VAEConfig:
    return VAEConfig(scaling_factor=0.13025)


def vae_audioldm() -> VAEConfig:
    # AudioLDM: 1-channel mel input, 8 latent channels, 2 blocks.
    return VAEConfig(in_channels=1, out_channels=1, latent_channels=8,
                     block_out_channels=(128, 256), scaling_factor=0.9227914)


def vae_tiny() -> VAEConfig:
    return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     norm_num_groups=4, latent_channels=4)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("btc,bsc->bts", q, k).astype(jnp.float32) / (C ** 0.5),
            axis=-1).astype(self.dtype)
        h = jnp.einsum("bts,bsc->btc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"down_{i}_res_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=2,
                            padding=((0, 1), (0, 1)), dtype=cfg.dtype,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(x)
        x = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                    name="quant_conv")(x)
        mean, logvar = jnp.split(x, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                    name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(z)
        x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(x)
        x = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(x)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"up_{i}_res_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
                x = nn.Conv(C, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")

    def encode(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encoder(x)
        if sample:
            assert rng is not None
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x, rng=None):
        z = self.encode(x, rng=rng, sample=rng is not None)
        return self.decode(z)
