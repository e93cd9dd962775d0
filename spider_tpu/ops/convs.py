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


class UpsampleNearestConv(nn.Module):
    """nearest-x2 upsample followed by a SAME 3x3 conv, computed at COARSE
    resolution (the diffusers Upsample2D pattern, e.g.
    /root/reference/spider/models/.../unet up-blocks).

    With nearest duplication, the 9 fine-grid taps of the 3x3 conv read at
    most a 2x2 coarse neighborhood, so the op folds exactly into 4 phase
    convs with tap-summed 2x2 kernels + a depth-to-space interleave:
      phase dy=0 reads coarse rows (i-1, i) with weights (w0, w1+w2);
      phase dy=1 reads rows (i, i+1) with (w0+w1, w2); same along x.
    That is 4/9 of the fine-grid conv FLOPs, no 4x-upsampled intermediate
    in HBM, and the stacked [2,2,Cin,4*Cout] kernel gives MXU-aligned
    K=4*Cin / N=4*Cout even at C=320. Param tree is IDENTICAL to
    nn.Conv(C, (3,3), padding=1) (kernel [3,3,Cin,Cout] + bias) so
    converters and checkpoints are unaffected.

    MEASURED AND REJECTED for the shipped decoders (tools/ab_upsample.py,
    2026-08-19 on-chip): the full UNet3D step got SLOWER with this op
    (299.3 -> 320.0 ms/step) and compile time ballooned (839 s first
    compile) — XLA schedules the nearest-resize + 3x3 as a fused
    broadcast-conv better than the 4-phase conv + depth-to-space
    interleave, whose output transpose dominates at the video decoder's
    [32,H,W,C] shapes. Kept as an op (exactness test in
    tests/test_misc_ops.py) for future shapes where the 4/9-FLOP saving
    wins; not used by unet2d/unet3d/vae."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        Co = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, C, Co), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (Co,), jnp.float32)
        k = kernel  # tap sums in f32, cast once after
        taps = lambda d: ((0,), (1, 2)) if d == 0 else ((0, 1), (2,))
        phases = []
        for dy in (0, 1):
            for dx in (0, 1):
                pk = jnp.stack([
                    jnp.stack([sum(k[u, v] for u in taps(dy)[a]
                               for v in taps(dx)[b]) for b in (0, 1)], 0)
                    for a in (0, 1)], 0)            # [2,2,Cin,Cout]
                phases.append(pk)
        w2 = jnp.concatenate(phases, axis=-1).astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,H+1,W+1,4Co]
        ph = [y[:, dy:dy + H, dx:dx + W, p * Co:(p + 1) * Co]
              for p, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
        out = jnp.stack(ph, axis=3).reshape(B, H, W, 2, 2, Co)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, Co)
        return out + bias.astype(self.dtype)


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
