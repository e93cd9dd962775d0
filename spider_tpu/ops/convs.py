"""1-D convolution helpers with exact torch semantics.

flax's `nn.ConvTranspose(padding="SAME")` is the gradient-of-conv padding
rule, which does NOT match `torch.nn.ConvTranspose1d(padding=(k-s)//2)` —
the cropping offsets differ whenever k != s, silently shifting every
vocoder upsample stage. The reference's audio outputs come from torch
ConvTranspose1d stacks (SpeechT5HifiGan inside AudioLDM, BigVGAN inside
Qwen2.5-Omni token2wav), so real converted weights require bit-compatible
upsampling. This module expresses torch transposed conv as an explicit
`conv_general_dilated`: zero-stuff via lhs_dilation, correlate with the
time-flipped kernel, crop with padding (k-1-p, k-1-p).

Parameter layout matches flax ConvTranspose ([k, in, out] "kernel" +
"bias"), so converters (models/convert.py `_convT1d`) and existing
checkpoints are unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvTranspose1dTorch(nn.Module):
    """torch.nn.ConvTranspose1d(in, features, kernel_size, stride,
    padding=(kernel_size-stride)//2) on [B, T, C] input."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, x.shape[-1], self.features), jnp.float32)
        p = (k - s) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[::-1].astype(self.dtype),
            window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NTC", "TIO", "NTC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
