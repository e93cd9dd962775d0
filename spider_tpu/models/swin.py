"""Swin Transformer backbone (flax) — Grounding DINO's image backbone
(swin-T: embed 96, depths 2/2/6/2, heads 3/6/12/24, window 7; the reference
uses mmdetection's vendored copy, cf. SURVEY.md §2.2)."""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.unet2d import _attention


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.float32


def swin_tiny() -> SwinConfig:
    return SwinConfig()


def swin_test() -> SwinConfig:
    return SwinConfig(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 4),
                      window_size=2)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(windows, ws, B, H, W):
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class SwinBlock(nn.Module):
    heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0

        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(h, ws)               # [nW*B, ws*ws, C]

        q = nn.Dense(C, dtype=self.dtype, name="q")(windows)
        k = nn.Dense(C, dtype=self.dtype, name="k")(windows)
        v = nn.Dense(C, dtype=self.dtype, name="v")(windows)
        # relative position bias
        rel = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.heads), jnp.float32)
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        relative = coords[:, :, None] - coords[:, None, :]
        relative = relative.transpose(1, 2, 0) + ws - 1
        rel_index = (relative[..., 0] * (2 * ws - 1) + relative[..., 1])
        bias = rel[jnp.asarray(rel_index.reshape(-1))]
        bias = bias.reshape(ws * ws, ws * ws, self.heads).transpose(2, 0, 1)

        D = C // self.heads
        nB = windows.shape[0]
        qh = q.reshape(nB, -1, self.heads, D).transpose(0, 2, 1, 3)
        kh = k.reshape(nB, -1, self.heads, D).transpose(0, 2, 1, 3)
        vh = v.reshape(nB, -1, self.heads, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / (D ** 0.5)
        logits = logits + bias[None].astype(logits.dtype)
        if shift:
            # mask cross-window attention in shifted windows
            img_mask = np.zeros((1, Hp, Wp, 1), np.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[:, hs, wsl] = cnt
                    cnt += 1
            mask_windows = _window_partition(jnp.asarray(img_mask, jnp.float32),
                                             ws)[..., 0]
            attn_mask = (mask_windows[:, None, :]
                         != mask_windows[:, :, None])
            attn_mask = jnp.where(attn_mask, -1e9, 0.0)
            nW = attn_mask.shape[0]
            logits = logits.reshape(nB // nW, nW, self.heads, ws * ws, ws * ws)
            logits = logits + attn_mask[None, :, None]
            logits = logits.reshape(nB, self.heads, ws * ws, ws * ws)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(vh.dtype), vh)
        out = out.transpose(0, 2, 1, 3).reshape(nB, ws * ws, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        h = _window_reverse(out, ws, B, Hp, Wp)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(C, dtype=self.dtype, name="fc2")(jax.nn.gelu(h))


class PatchMerging(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    config: SwinConfig

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """x [B, 3, H, W] -> list of NHWC stage features (out_indices)."""
        cfg = self.config
        x = x.transpose(0, 2, 3, 1).astype(cfg.dtype)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=cfg.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="patch_norm")(x)
        outs = []
        for stage, depth in enumerate(cfg.depths):
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(cfg.num_heads[stage], cfg.window_size, shift,
                              cfg.mlp_ratio, cfg.dtype,
                              name=f"stage{stage}_block{blk}")(x)
            if stage in cfg.out_indices:
                outs.append(nn.LayerNorm(dtype=cfg.dtype,
                                         name=f"out_norm{stage}")(x))
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(cfg.dtype, name=f"merge{stage}")(x)
        return outs
