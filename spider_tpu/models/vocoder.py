"""HiFiGAN vocoder (flax) — mel-spectrogram -> waveform, the final stage of
the AudioLDM pipeline (SpeechT5HifiGan in the reference's dependency chain,
cf. /root/reference/spider/models/custom_ad.py)."""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from spider_tpu.ops.convs import ConvTranspose1dTorch


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    model_in_dim: int = 64              # mel bins
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_relu_slope: float = 0.1
    normalize_before: bool = True
    dtype: Any = jnp.float32


def hifigan_audioldm() -> HifiGanConfig:
    return HifiGanConfig()


def hifigan_tiny() -> HifiGanConfig:
    return HifiGanConfig(model_in_dim=8, upsample_initial_channel=16,
                         upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))


class ResBlock1D(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    slope: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, self.slope)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        dtype=self.dtype, name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, self.slope)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv2_{i}")(h)
            x = x + h
        return x


class HifiGan(nn.Module):
    """mel [B, T, n_mels] -> waveform [B, T * prod(upsample_rates)]."""

    config: HifiGanConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = mel
        if cfg.normalize_before:
            mean = self.param("mean", nn.initializers.zeros,
                              (cfg.model_in_dim,), jnp.float32)
            scale = self.param("scale", nn.initializers.ones,
                               (cfg.model_in_dim,), jnp.float32)
            x = (x - mean) / scale
        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding="SAME",
                    dtype=cfg.dtype, name="conv_pre")(x)
        ch = cfg.upsample_initial_channel
        for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates,
                                              cfg.upsample_kernel_sizes)):
            ch //= 2
            x = nn.leaky_relu(x, cfg.leaky_relu_slope)
            x = ConvTranspose1dTorch(ch, ksize, rate, dtype=cfg.dtype,
                                     name=f"up_{i}")(x)
            acc = None
            for j, (k, ds) in enumerate(zip(cfg.resblock_kernel_sizes,
                                            cfg.resblock_dilation_sizes)):
                r = ResBlock1D(ch, k, tuple(ds), cfg.leaky_relu_slope,
                               cfg.dtype, name=f"res_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / len(cfg.resblock_kernel_sizes)
        x = nn.leaky_relu(x, cfg.leaky_relu_slope)
        x = nn.Conv(1, (7,), padding="SAME", dtype=cfg.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
