"""Qwen2.5-Omni token2wav, TPU-native flax — speech-codec tokens -> waveform.

Third stage of the reference's flagship Omni stack (speech out of the chat
response, /root/reference/qwen2.5omni_spider_web.py:591-600). Faithful to
transformers' Qwen2_5OmniToken2WavModel (modeling_qwen2_5_omni.py):

  * DiT flow-matching mel generator: codec-token embedding (x2
    repeat_interleave), ECAPA-TDNN speaker encoder over a reference mel,
    AdaLN-Zero transformer with block-local attention (block_size frames,
    per-layer look-ahead/look-backward of one block) and rotary applied to
    the FIRST head only (a released-checkpoint quirk we reproduce), RK4
    (Kutta 3/8) ODE integration over a sway-warped time grid with
    classifier-free guidance;
  * BigVGAN vocoder: log-mel -> dB -> [-1,1] normalization, conv stem,
    transposed-conv upsampling with anti-aliased SnakeBeta activations
    (fixed kaiser-sinc up/down filters) and AMP residual blocks.

Everything runs in [B, T, C] layout (flax channel-last); converters in
models/convert.py map the torch [B, C, T] weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.ops.convs import ConvTranspose1dTorch


# ----------------------------------------------------------------- configs

@dataclasses.dataclass(frozen=True)
class DiTConfig:
    mel_dim: int = 80
    num_embeds: int = 8193
    emb_dim: int = 512
    hidden_size: int = 1024
    num_hidden_layers: int = 22
    num_attention_heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    block_size: int = 24
    look_ahead_layers: Tuple[int, ...] = (10,)
    look_backward_layers: Tuple[int, ...] = (0, 20)
    repeats: int = 2
    # ECAPA speaker encoder
    enc_dim: int = 128
    enc_emb_dim: int = 192
    enc_channels: Tuple[int, ...] = (256, 256, 256, 256, 768)
    enc_kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 1)
    enc_dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 64
    enc_res2net_scale: int = 2
    enc_se_channels: int = 64
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    mel_dim: int = 80
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_rates: Tuple[int, ...] = (5, 3, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (11, 7, 4, 4, 4, 4)
    dtype: Any = jnp.float32


def dit_full() -> DiTConfig:
    return DiTConfig()


def bigvgan_full() -> BigVGANConfig:
    return BigVGANConfig()


def dit_tiny() -> DiTConfig:
    return DiTConfig(mel_dim=8, num_embeds=16, emb_dim=12, hidden_size=32,
                     num_hidden_layers=3, num_attention_heads=2, head_dim=16,
                     block_size=4, look_ahead_layers=(1,),
                     look_backward_layers=(0, 2),
                     enc_channels=(8, 8, 8, 8, 24),
                     enc_dim=12, enc_emb_dim=6, enc_attention_channels=4,
                     enc_res2net_scale=2, enc_se_channels=4)


def bigvgan_tiny() -> BigVGANConfig:
    return BigVGANConfig(mel_dim=8, upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3, 5),),
                         upsample_rates=(2, 2),
                         upsample_kernel_sizes=(4, 4))


# ------------------------------------------------------- conv helpers (1-D)

def _reflect_pad_t(x, lo: int, hi: int):
    if lo == 0 and hi == 0:
        return x
    return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="reflect")


class TDNNBlock(nn.Module):
    """Conv1d('same', reflect padding) + ReLU (TimeDelayNetBlock)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation // 2
        h = _reflect_pad_t(x, pad, pad)
        h = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    dtype=self.dtype, name="conv")(h)
        return nn.relu(h)


# ------------------------------------------------- ECAPA speaker encoder

class Res2NetBlock(nn.Module):
    out_channels: int
    scale: int
    kernel_size: int
    dilation: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        parts = jnp.split(x, self.scale, axis=-1)
        outs = []
        prev = None
        for i, part in enumerate(parts):
            if i == 0:
                prev = part
            elif i == 1:
                prev = TDNNBlock(self.out_channels // self.scale,
                                 self.kernel_size, self.dilation, self.dtype,
                                 name=f"block_{i - 1}")(part)
            else:
                prev = TDNNBlock(self.out_channels // self.scale,
                                 self.kernel_size, self.dilation, self.dtype,
                                 name=f"block_{i - 1}")(part + prev)
            outs.append(prev)
        return jnp.concatenate(outs, axis=-1)


class SEBlock(nn.Module):
    se_channels: int
    out_channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.se_channels, dtype=self.dtype,
                             name="conv1")(s))
        s = nn.sigmoid(nn.Dense(self.out_channels, dtype=self.dtype,
                                name="conv2")(s))
        return x * s


class SERes2NetBlock(nn.Module):
    out_channels: int
    res2net_scale: int
    se_channels: int
    kernel_size: int
    dilation: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = TDNNBlock(self.out_channels, 1, 1, self.dtype, name="tdnn1")(x)
        h = Res2NetBlock(self.out_channels, self.res2net_scale,
                         self.kernel_size, self.dilation, self.dtype,
                         name="res2net_block")(h)
        h = TDNNBlock(self.out_channels, 1, 1, self.dtype, name="tdnn2")(h)
        h = SEBlock(self.se_channels, self.out_channels, self.dtype,
                    name="se_block")(h)
        return x + h


class AttentiveStatsPooling(nn.Module):
    channels: int
    attention_channels: int
    dtype: Any
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        # x [B, T, C]; full-length masks (inference path: lengths == T)
        T = x.shape[1]
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.clip(
            jnp.mean((x - mean) ** 2, axis=1, keepdims=True), self.eps))
        attn = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape),
             jnp.broadcast_to(std, x.shape)], axis=-1)
        attn = TDNNBlock(self.attention_channels, 1, 1, self.dtype,
                         name="tdnn")(attn)
        attn = nn.Dense(self.channels, dtype=self.dtype,
                        name="conv")(jnp.tanh(attn))
        w = jax.nn.softmax(attn, axis=1)
        mean = jnp.sum(w * x, axis=1)
        std = jnp.sqrt(jnp.clip(
            jnp.sum(w * (x - mean[:, None]) ** 2, axis=1), self.eps))
        return jnp.concatenate([mean, std], axis=-1)       # [B, 2C]


class ECAPAEncoder(nn.Module):
    """ECAPA-TDNN speaker embedding over a reference mel [B, T, mel]."""

    config: DiTConfig

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        feats = []
        h = TDNNBlock(cfg.enc_channels[0], cfg.enc_kernel_sizes[0],
                      cfg.enc_dilations[0], cfg.dtype, name="block_0")(mel)
        feats.append(h)
        for i in range(1, len(cfg.enc_channels) - 1):
            h = SERes2NetBlock(cfg.enc_channels[i], cfg.enc_res2net_scale,
                               cfg.enc_se_channels, cfg.enc_kernel_sizes[i],
                               cfg.enc_dilations[i], cfg.dtype,
                               name=f"block_{i}")(h)
            feats.append(h)
        h = jnp.concatenate(feats[1:], axis=-1)
        h = TDNNBlock(cfg.enc_channels[-1], cfg.enc_kernel_sizes[-1],
                      cfg.enc_dilations[-1], cfg.dtype, name="mfa")(h)
        pooled = AttentiveStatsPooling(cfg.enc_channels[-1],
                                       cfg.enc_attention_channels, cfg.dtype,
                                       name="asp")(h)
        return nn.Dense(cfg.enc_dim, dtype=cfg.dtype,
                        name="fc")(pooled)                  # [B, enc_dim]


# --------------------------------------------------------------------- DiT

def _timestep_embedding(t, dim: int = 256, scale: float = 1000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / (half - 1))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _rotate_interleaved(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


class DiTAttention(nn.Module):
    """Block-local attention; rotary on head 0 only (HF quirk)."""

    config: DiTConfig
    look_ahead: int
    look_backward: int

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, T, _ = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(H * D, dtype=cfg.dtype, name="to_q")(x)
        k = nn.Dense(H * D, dtype=cfg.dtype, name="to_k")(x)
        v = nn.Dense(H * D, dtype=cfg.dtype, name="to_v")(x)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        # interleaved rope, first head only
        pos = jnp.arange(T)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, D, 2) / D))
        f = pos[:, None] * inv[None, :]
        f = jnp.stack([f, f], axis=-1).reshape(T, D)
        cos, sin = jnp.cos(f), jnp.sin(f)
        q0 = q[:, :1] * cos + _rotate_interleaved(q[:, :1]) * sin
        k0 = k[:, :1] * cos + _rotate_interleaved(k[:, :1]) * sin
        q = jnp.concatenate([q0.astype(q.dtype), q[:, 1:]], axis=1)
        k = jnp.concatenate([k0.astype(k.dtype), k[:, 1:]], axis=1)

        blk = pos // cfg.block_size
        diff = blk[None, :] - blk[:, None]
        mask = (diff >= -self.look_backward) & (diff <= self.look_ahead)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(D)
        logits = jnp.where(mask[None, None], logits.astype(jnp.float32),
                           -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H * D)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="to_out")(out)


class DiTLayer(nn.Module):
    config: DiTConfig
    look_ahead: int
    look_backward: int

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.config
        mod = nn.Dense(cfg.hidden_size * 6, dtype=cfg.dtype,
                       name="attn_norm_linear")(nn.silu(temb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, -1)
        ln = lambda h: nn.LayerNorm(use_bias=False, use_scale=False,
                                    epsilon=1e-6)(h)
        h = ln(x) * (1 + sc_msa[:, None]) + sh_msa[:, None]
        attn = DiTAttention(cfg, self.look_ahead, self.look_backward,
                            name="attn")(h)
        x = x + g_msa[:, None] * attn
        h = ln(x) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        h = nn.Dense(cfg.hidden_size * cfg.ff_mult, dtype=cfg.dtype,
                     name="ff_in")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ff_out")(h)
        return x + g_mlp[:, None] * h


class DiTModel(nn.Module):
    """Velocity prediction: (noisy mel, speaker cond, ref mel, codec codes,
    t) -> mel_dim output. Mirrors Qwen2_5OmniToken2WavDiTModel.forward."""

    config: DiTConfig

    @nn.compact
    def __call__(self, x, speaker_embedding, condition_mel, code,
                 t, apply_cfg: bool = True, drop_audio_cond: bool = False,
                 drop_code: bool = False):
        cfg = self.config
        B = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, cfg.dtype).reshape(-1), (B,))

        temb = _timestep_embedding(t)
        temb = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                        name="time_mlp_in")(temb)
        temb = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                        name="time_mlp_out")(nn.silu(temb))

        embed = nn.Embed(cfg.num_embeds + 1, cfg.emb_dim, dtype=cfg.dtype,
                         name="codec_embed")
        code_embed = jnp.repeat(embed(code if not drop_code or apply_cfg
                                      else jnp.zeros_like(code)),
                                cfg.repeats, axis=1)
        if apply_cfg:
            code_uncond = jnp.repeat(embed(jnp.zeros_like(code)),
                                     cfg.repeats, axis=1)
            x = jnp.concatenate([x, x], axis=0)
            speaker_embedding = jnp.concatenate(
                [speaker_embedding, jnp.zeros_like(speaker_embedding)], 0)
            condition_mel = jnp.concatenate(
                [condition_mel, jnp.zeros_like(condition_mel)], 0)
            code_embed = jnp.concatenate([code_embed, code_uncond], axis=0)
            temb = jnp.concatenate([temb, temb], axis=0)
        elif drop_audio_cond:
            condition_mel = jnp.zeros_like(condition_mel)
            speaker_embedding = jnp.zeros_like(speaker_embedding)

        enc = ECAPAEncoder(cfg, name="spk_encoder")(condition_mel)
        enc = jnp.broadcast_to(enc[:, None], (x.shape[0], x.shape[1],
                                              cfg.enc_dim))
        h = jnp.concatenate([x, enc, code_embed, speaker_embedding], axis=-1)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="input_proj")(h)

        for i in range(cfg.num_hidden_layers):
            h = DiTLayer(cfg,
                         1 if i in cfg.look_ahead_layers else 0,
                         1 if i in cfg.look_backward_layers else 0,
                         name=f"layer_{i}")(h, temb)

        mod = nn.Dense(cfg.hidden_size * 2, dtype=cfg.dtype,
                       name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(h)
        h = h * (1 + scale[:, None]) + shift[:, None]
        return nn.Dense(cfg.mel_dim, dtype=cfg.dtype, name="proj_out")(h)


def dit_sample(model: DiTModel, params, code, conditioning, reference_mel,
               rng, num_steps: int = 10, guidance_scale: float = 0.5,
               sway_coefficient: float = -1.0):
    """RK4 (Kutta 3/8) flow integration -> mel [1, T_mel, mel_dim].

    code [1, N]; conditioning [1, enc_emb_dim]; reference_mel [1, T_ref,
    mel_dim]. Matches Qwen2_5OmniToken2WavDiTModel.sample (noise drawn from
    `rng` instead of torch's global generator)."""
    cfg = model.config
    T = code.shape[1] * cfg.repeats
    y = jax.random.normal(rng, (1, T, cfg.mel_dim), jnp.float32)
    spk = jnp.broadcast_to(conditioning[:, None],
                           (1, T, conditioning.shape[-1]))

    t_grid = jnp.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        t_grid = t_grid + sway_coefficient * (
            jnp.cos(jnp.pi / 2 * t_grid) - 1 + t_grid)

    def vf(t, y):
        out = model.apply(params, y, spk, reference_mel, code, t,
                          apply_cfg=True)
        guided, null = jnp.split(out, 2, axis=0)
        return guided + (guided - null) * guidance_scale

    def rk4_step(y, ts):
        t0, t1 = ts
        h = t1 - t0
        k1 = vf(t0, y)
        k2 = vf(t0 + h / 3, y + h * k1 / 3)
        k3 = vf(t0 + 2 * h / 3, y + h * (k2 - k1 / 3))
        k4 = vf(t1, y + h * (k1 - k2 + k3))
        return y + (k1 + 3 * (k2 + k3) + k4) * h / 8, None

    pairs = jnp.stack([t_grid[:-1], t_grid[1:]], axis=1)
    y, _ = jax.lax.scan(rk4_step, y, pairs)
    return y


# ----------------------------------------------------------------- BigVGAN

def _kaiser_sinc_filter(cutoff: float, half_width: float,
                        kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    win = np.kaiser(kernel_size, beta)
    if even:
        t = np.arange(-half_size, half_size) + 0.5
    else:
        t = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((kernel_size,), np.float32)
    f = 2 * cutoff * win * np.sinc(2 * cutoff * t)
    return (f / f.sum()).astype(np.float32)


def _replicate_pad_t(x, lo: int, hi: int):
    return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="edge")


def _depthwise(x, filt: np.ndarray, stride: int = 1, lhs_dilation: int = 1,
               pad: Tuple[int, int] = (0, 0)):
    """Per-channel correlation with one shared [K] filter on [B, T, C]."""
    C = x.shape[-1]
    k = jnp.asarray(np.tile(filt[:, None, None], (1, 1, C)))
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(stride,), padding=[pad],
        lhs_dilation=(lhs_dilation,), feature_group_count=C,
        dimension_numbers=("NTC", "TIO", "NTC"))


def _upsample1d(x, ratio: int = 2, kernel_size: int = 12):
    K, s = kernel_size, ratio
    f = _kaiser_sinc_filter(0.5 / s, 0.6 / s, K)
    pad = K // s - 1
    x = _replicate_pad_t(x, pad, pad)
    # conv_transpose == zero-stuff (lhs_dilation) + full correlation with the
    # flipped filter; the kaiser-sinc filter is symmetric so no flip needed
    y = s * _depthwise(x, f, lhs_dilation=s, pad=(K - 1, K - 1))
    pad_left = pad * s + (K - s) // 2
    pad_right = pad * s + (K - s + 1) // 2
    return y[:, pad_left:-pad_right]


def _downsample1d(x, ratio: int = 2, kernel_size: int = 12):
    K = kernel_size
    f = _kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, K)
    even = K % 2 == 0
    x = _replicate_pad_t(x, K // 2 - int(even), K // 2)
    return _depthwise(x, f, stride=ratio)


class SnakeBeta(nn.Module):
    """x + exp(-beta) * sin^2(x * exp(alpha)); anti-aliased (2x up, act,
    2x down) as in BigVGAN's TorchActivation1d."""

    channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        x = _upsample1d(x)
        x = x + (1.0 / (jnp.exp(beta) + 1e-9)) * \
            jnp.sin(x * jnp.exp(alpha)) ** 2
        return _downsample1d(x)


class AMPBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = SnakeBeta(self.channels, self.dtype, name=f"act1_{i}")(x)
            pad = (self.kernel_size - 1) * d // 2
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,),
                        padding=[(pad, pad)], dtype=self.dtype,
                        name=f"conv1_{i}")(h)
            h = SnakeBeta(self.channels, self.dtype, name=f"act2_{i}")(h)
            pad = (self.kernel_size - 1) // 2
            h = nn.Conv(self.channels, (self.kernel_size,),
                        padding=[(pad, pad)], dtype=self.dtype,
                        name=f"conv2_{i}")(h)
            x = x + h
        return x


class BigVGAN(nn.Module):
    """log-mel [B, T, mel] -> waveform [B, T * prod(rates)] in [-1, 1]."""

    config: BigVGANConfig

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        # process_mel_spectrogram: exp -> dB (floor -115) -> [-1, 1]
        amp = jnp.exp(mel)
        min_level = math.exp(-115 / 20.0 * math.log(10))
        db = 20.0 * jnp.log10(jnp.clip(amp, min_level)) - 20.0
        x = jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)

        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=cfg.dtype, name="conv_pre")(x)
        ch = cfg.upsample_initial_channel
        for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates,
                                              cfg.upsample_kernel_sizes)):
            ch //= 2
            x = ConvTranspose1dTorch(ch, ksize, rate, dtype=cfg.dtype,
                                     name=f"up_{i}")(x)
            acc = None
            for j, (k, ds) in enumerate(zip(cfg.resblock_kernel_sizes,
                                            cfg.resblock_dilation_sizes)):
                r = AMPBlock(ch, k, tuple(ds), cfg.dtype,
                             name=f"res_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / len(cfg.resblock_kernel_sizes)
        x = SnakeBeta(ch, cfg.dtype, name="activation_post")(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], use_bias=False,
                    dtype=cfg.dtype, name="conv_post")(x)
        return jnp.clip(x[..., 0], -1.0, 1.0)


# ------------------------------------------------------------ full bundle

class OmniToken2Wav:
    """DiT mel generation + BigVGAN vocoding (Qwen2_5OmniToken2WavModel)."""

    def __init__(self, dit: DiTModel, dit_params, vocoder: BigVGAN,
                 vocoder_params):
        self.dit = dit
        self.dit_params = dit_params
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self._voc_fn = jax.jit(
            lambda p, mel: vocoder.apply(p, mel))

    def __call__(self, code, conditioning, reference_mel,
                 num_steps: int = 10, guidance_scale: float = 0.5,
                 sway_coefficient: float = -1.0,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mel = dit_sample(self.dit, self.dit_params, jnp.asarray(code),
                         jnp.asarray(conditioning),
                         jnp.asarray(reference_mel), rng,
                         num_steps=num_steps, guidance_scale=guidance_scale,
                         sway_coefficient=sway_coefficient)
        return np.asarray(self._voc_fn(self.vocoder_params, mel))[0]


def build_tiny_token2wav(rng: Optional[jax.Array] = None) -> OmniToken2Wav:
    from spider_tpu.models.factory import random_params_like

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dcfg, bcfg = dit_tiny(), bigvgan_tiny()
    dit = DiTModel(dcfg)
    dparams = random_params_like(
        dit, rng, jnp.zeros((1, 8, dcfg.mel_dim)),
        jnp.zeros((1, 8, dcfg.enc_emb_dim)),
        jnp.zeros((1, 6, dcfg.mel_dim)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)))
    voc = BigVGAN(bcfg)
    vparams = random_params_like(voc, rng, jnp.zeros((1, 8, bcfg.mel_dim)))
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return OmniToken2Wav(dit, to_j(dparams), voc, to_j(vparams))
