"""ImageBind-class joint-embedding encoder (flax) — Spider's frozen input
encoder: vision (image + video clips) and audio (mel spectrogram) trunks
projecting into one 1024-d joint space
(cf. /root/reference/spider/models/ImageBind/models/imagebind_model.py:455-506
and the multi-clip mean-reduction at :458-488).

Vision trunk = ViT-H/14 over 2-frame tubes (images are repeated to 2 frames,
videos arrive as 5-D clip stacks that flatten through the trunk and mean-
reduce over clips). Audio trunk = ViT-B/16-ish over 128x204 mel patches with
stride 10.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.unet2d import _attention


@dataclasses.dataclass(frozen=True)
class TrunkConfig:
    width: int
    layers: int
    heads: int
    pre_ln: bool = True


@dataclasses.dataclass(frozen=True)
class ImageBindConfig:
    embed_dim: int = 1024                       # joint space
    vision: TrunkConfig = dataclasses.field(
        default_factory=lambda: TrunkConfig(1280, 32, 16))
    audio: TrunkConfig = dataclasses.field(
        default_factory=lambda: TrunkConfig(768, 12, 12))
    image_size: int = 224
    patch_size: int = 14
    video_frames: int = 2
    audio_mel_bins: int = 128
    audio_target_len: int = 204
    audio_patch: int = 16
    audio_stride: int = 10
    dtype: Any = jnp.float32


def imagebind_huge() -> ImageBindConfig:
    return ImageBindConfig()


def imagebind_tiny() -> ImageBindConfig:
    return ImageBindConfig(
        embed_dim=32,
        vision=TrunkConfig(48, 2, 2),
        audio=TrunkConfig(32, 2, 2),
        image_size=28, patch_size=14,
        audio_mel_bins=16, audio_target_len=20, audio_patch=16,
        audio_stride=10)


class ViTBlock(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        x = x + nn.Dense(C, dtype=self.dtype, name="proj")(
            _attention(q, k, v, self.heads))
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(C * 4, dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(C, dtype=self.dtype, name="fc2")(jax.nn.gelu(h))


class Trunk(nn.Module):
    cfg: TrunkConfig
    dtype: Any

    @nn.compact
    def __call__(self, tokens):
        """tokens [B, T, width] (patch embeddings; cls + positions added
        here — pos_embed covers cls+patches, matching the reference's
        pos_embedding_helper layout)."""
        B, T, _ = tokens.shape
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.cfg.width), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.cfg.width)),
             tokens], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, T + 1, self.cfg.width), jnp.float32)
        x = x + pos.astype(self.dtype)
        if self.cfg.pre_ln:
            x = nn.LayerNorm(dtype=self.dtype, name="pre_ln")(x)
        for i in range(self.cfg.layers):
            x = ViTBlock(self.cfg.heads, self.dtype, name=f"block_{i}")(x)
        return x


class ImageBindEncoder(nn.Module):
    """__call__(inputs: dict) -> dict of [B, embed_dim] joint embeddings.

    inputs keys (any subset): 'vision' [B,3,F,H,W] or [B,Clips,3,F,H,W];
    'audio' [B,1,M,T] or [B,Clips,1,M,T] (NCHW torch layout kept at the API
    for sample-dict compatibility; transposed internally).
    """

    config: ImageBindConfig

    # ---- vision ---------------------------------------------------------
    def _vision_tokens(self, x):
        cfg = self.config
        # x: [B, 3, F, H, W] -> NDHWC
        x = x.transpose(0, 2, 3, 4, 1).astype(cfg.dtype)
        x = nn.Conv(cfg.vision.width,
                    (cfg.video_frames, cfg.patch_size, cfg.patch_size),
                    strides=(cfg.video_frames, cfg.patch_size, cfg.patch_size),
                    use_bias=False, dtype=cfg.dtype, name="vision_patch")(x)
        B = x.shape[0]
        return x.reshape(B, -1, cfg.vision.width)

    def _encode_vision(self, x):
        cfg = self.config
        multi_clip = x.ndim == 6
        if multi_clip:
            B, S = x.shape[:2]
            x = x.reshape((B * S,) + x.shape[2:])
        tokens = self._vision_tokens(x)
        out = Trunk(cfg.vision, cfg.dtype, name="vision_trunk")(tokens)
        cls = out[:, 0]
        cls = nn.LayerNorm(dtype=cfg.dtype, name="vision_head_ln")(cls)
        emb = nn.Dense(cfg.embed_dim, use_bias=False, dtype=cfg.dtype,
                       name="vision_head")(cls)
        if multi_clip:
            emb = emb.reshape(B, S, -1).mean(axis=1)  # mean over clips
        return emb

    # ---- audio ----------------------------------------------------------
    def _encode_audio(self, x):
        cfg = self.config
        multi_clip = x.ndim == 5
        if multi_clip:
            B, S = x.shape[:2]
            x = x.reshape((B * S,) + x.shape[2:])
        # x: [B, 1, M, T] -> NHWC
        x = x.transpose(0, 2, 3, 1).astype(cfg.dtype)
        x = nn.Conv(cfg.audio.width, (cfg.audio_patch, cfg.audio_patch),
                    strides=(cfg.audio_stride, cfg.audio_stride),
                    use_bias=False, dtype=cfg.dtype, name="audio_patch")(x)
        B2 = x.shape[0]
        tokens = x.reshape(B2, -1, cfg.audio.width)
        out = Trunk(cfg.audio, cfg.dtype, name="audio_trunk")(tokens)
        cls = out[:, 0]
        cls = nn.LayerNorm(dtype=cfg.dtype, name="audio_head_ln")(cls)
        emb = nn.Dense(cfg.embed_dim, use_bias=False, dtype=cfg.dtype,
                       name="audio_head")(cls)
        if multi_clip:
            emb = emb.reshape(B, S, -1).mean(axis=1)
        return emb

    @nn.compact
    def __call__(self, inputs):
        out = {}
        if "vision" in inputs and inputs["vision"] is not None:
            v = inputs["vision"]
            if v.ndim == 4:  # single image [B,3,H,W] -> repeat to 2 frames
                v = jnp.repeat(v[:, :, None], self.config.video_frames, axis=2)
            out["vision"] = self._encode_vision(v)
        if "audio" in inputs and inputs["audio"] is not None:
            out["audio"] = self._encode_audio(inputs["audio"])
        return out
