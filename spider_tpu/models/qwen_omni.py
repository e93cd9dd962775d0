"""Qwen2.5-Omni "thinker", TPU-native flax — any-modality in, text out.

The reference's flagship SpiderFree LLM is Qwen2.5-Omni loaded through
transformers (/root/reference/qwen2.5omni_spider_web.py:368-383) with
audio/image/video routed through its processor (:458-466). This module is
the in-framework equivalent of the THINKER half (understanding + text
generation); the talker (speech-token head) lives in
models/omni_talker.py.

Faithful to the released architecture (verified numerically against the
local transformers implementation, tests/test_qwen_omni.py):

  * audio tower  — Whisper-style encoder processed in n_window*2-mel-frame
    chunks: per-chunk conv subsample (k3 s1 + k3 s2, gelu, pad-masked),
    per-chunk restarting sinusoidal positions, pre-LN transformer whose
    attention is block-diagonal over chunks (k_proj carries no bias),
    then per-audio avg-pool(2) -> LayerNorm -> proj to the thinker width.
  * vision tower — Qwen2.5-VL-style ViT: bias-free patch embed over
    (C, temporal_patch, p, p) patch vectors, 2-D rotary embeddings,
    RMSNorm blocks with separate q/k/v (bias) and SwiGLU MLP (bias),
    WINDOWED attention (tokens reordered into window_size//p windows,
    block-diagonal) with full attention at fullatt_block_indexes, and a
    2x2 patch merger (RMSNorm -> 4C MLP -> out width).
  * thinker LLM  — models/llama.py decoder with mrope_section 3-D RoPE
    (temporal/height/width position streams, get_rope_index port below).

The unused-at-inference `audio_bos_eos_token` embedding of the HF audio
tower is intentionally not modeled (transformers keeps it for BC; it never
enters the forward path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from spider_tpu.ops.norms import rms_norm


# ----------------------------------------------------------------- configs

@dataclasses.dataclass(frozen=True)
class OmniAudioConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    n_window: int = 100                # attention chunk = n_window tokens
    max_positions: int = 1500
    output_dim: int = 3584             # thinker hidden
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class OmniVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def omni_audio_full() -> OmniAudioConfig:
    return OmniAudioConfig()


def omni_vision_full() -> OmniVisionConfig:
    return OmniVisionConfig()


def omni_audio_tiny() -> OmniAudioConfig:
    return OmniAudioConfig(num_mel_bins=16, d_model=32, num_layers=2,
                           num_heads=4, ffn_dim=64, n_window=8,
                           max_positions=64, output_dim=64)


def omni_vision_tiny() -> OmniVisionConfig:
    return OmniVisionConfig(depth=2, hidden_size=32, intermediate_size=64,
                            num_heads=4, patch_size=4, window_size=16,
                            fullatt_block_indexes=(1,), out_hidden_size=64)


def thinker_llm_full() -> LlamaConfig:
    """Qwen2.5-Omni-7B thinker text config (Qwen2_5OmniTextConfig
    defaults)."""
    return LlamaConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        max_position_embeddings=32768, rms_norm_eps=1e-6,
        rope_theta=1000000.0, attention_bias=True,
        mrope_section=(16, 24, 24))


def thinker_tiny_llm() -> LlamaConfig:
    from spider_tpu.models.llama import llama_tiny

    tiny = llama_tiny(vocab_size=512)
    d2 = (tiny.hidden_size // tiny.num_attention_heads) // 2
    return dataclasses.replace(tiny, attention_bias=True,
                               mrope_section=(d2 - 2 * (d2 // 3),
                                              d2 // 3, d2 // 3))


# ------------------------------------------------------------ audio tower

def sinusoid_positions(length: int, channels: int,
                       max_timescale: float = 10000.0) -> np.ndarray:
    """transformers SinusoidsPositionEmbedding (non-persistent buffer)."""
    inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


def audio_chunk_lengths(t_mel: int, n_window: int) -> List[int]:
    """HF chunking: n_window*2 mel frames per chunk, ragged tail."""
    chunk = n_window * 2
    n = -(-t_mel // chunk)
    lens = [chunk] * n
    if t_mel % chunk:
        lens[-1] = t_mel % chunk
    return lens


class _AudioAttention(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, valid_len):
        # x [N, T, C]; keys at positions >= valid_len[n] are masked out
        N, T, C = x.shape
        D = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(N, T, self.heads, D).transpose(0, 2, 1, 3)
        k = k.reshape(N, T, self.heads, D).transpose(0, 2, 1, 3)
        v = v.reshape(N, T, self.heads, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhtd,nhsd->nhts", q, k).astype(jnp.float32)
        logits = logits / (D ** 0.5)
        keymask = (jnp.arange(T)[None, :] < valid_len[:, None])  # [N, T]
        logits = jnp.where(keymask[:, None, None, :], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhts,nhsd->nhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(N, T, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class _AudioEncoderLayer(nn.Module):
    cfg: OmniAudioConfig

    @nn.compact
    def __call__(self, x, valid_len):
        c = self.cfg
        h = nn.LayerNorm(dtype=c.dtype, name="self_attn_layer_norm")(x)
        x = x + _AudioAttention(c.num_heads, c.dtype, name="self_attn")(
            h, valid_len)
        h = nn.LayerNorm(dtype=c.dtype, name="final_layer_norm")(x)
        h = nn.Dense(c.ffn_dim, dtype=c.dtype, name="fc1")(h)
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(nn.gelu(h))
        return x + h


class OmniAudioEncoder(nn.Module):
    """Chunk-batched audio encoder.

    __call__(chunks [N, Lm, mel_bins], mel_lens [N], gather_idx [T_total])
      -> [T_total // 2, output_dim]
    where chunks are n_window*2-frame mel slices of ONE audio (ragged tail
    zero-padded), and gather_idx indexes the valid post-conv tokens of the
    flattened [N*La] sequence in order (host-computed, static per shape).
    """

    config: OmniAudioConfig

    @nn.compact
    def __call__(self, chunks, mel_lens, gather_idx):
        cfg = self.config
        x = chunks.astype(cfg.dtype)
        N, Lm, _ = x.shape
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), padding=1, dtype=cfg.dtype,
                            name="conv1")(x))
        melmask = jnp.arange(Lm)[None, :] < mel_lens[:, None]
        x = x * melmask[..., None].astype(x.dtype)
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1,
                            dtype=cfg.dtype, name="conv2")(x))
        La = x.shape[1]
        pos = sinusoid_positions(cfg.max_positions, cfg.d_model)
        x = x + jnp.asarray(pos[:La])[None].astype(x.dtype)
        after_lens = (mel_lens - 1) // 2 + 1
        for i in range(cfg.num_layers):
            x = _AudioEncoderLayer(cfg, name=f"layer_{i}")(x, after_lens)
        flat = x.reshape(N * La, cfg.d_model)
        valid = jnp.take(flat, gather_idx, axis=0)     # [T_total, d]
        T2 = valid.shape[0] // 2
        pooled = valid[: T2 * 2].reshape(T2, 2, cfg.d_model).mean(axis=1)
        pooled = nn.LayerNorm(dtype=cfg.dtype, name="ln_post")(pooled)
        return nn.Dense(cfg.output_dim, dtype=cfg.dtype, name="proj")(pooled)


def encode_audio_host(enc: OmniAudioEncoder, params, mel: np.ndarray):
    """mel [T_mel, mel_bins] -> [n_tokens, output_dim]; host does the
    chunking + valid-token index computation (static per input shape)."""
    cfg = enc.config
    t_mel = int(mel.shape[0])
    lens = audio_chunk_lengths(t_mel, cfg.n_window)
    chunk = cfg.n_window * 2
    n = len(lens)
    chunks = np.zeros((n, chunk, cfg.num_mel_bins), np.float32)
    off = 0
    for i, ln in enumerate(lens):
        chunks[i, :ln] = mel[off: off + ln]
        off += ln
    la = (chunk - 1) // 2 + 1
    after = [(ln - 1) // 2 + 1 for ln in lens]
    gather = np.concatenate(
        [np.arange(a) + i * la for i, a in enumerate(after)]).astype(np.int32)
    return enc.apply(params, jnp.asarray(chunks),
                     jnp.asarray(lens, jnp.int32), jnp.asarray(gather))


# ----------------------------------------------------------- vision tower

def patchify_image(img: np.ndarray, cfg: OmniVisionConfig
                   ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """HWC image (already resized so H, W % (patch*merge) == 0, normalized)
    -> (patch vectors [S, C*tp*p*p] in the HF processor's order,
    grid_thw).  Matches Qwen2VLImageProcessor patch flattening: a single
    image is repeated temporal_patch_size times."""
    p, m, tp = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    H, W, C = img.shape
    gh, gw = H // p, W // p
    x = np.repeat(img.transpose(2, 0, 1)[None], tp, axis=0)  # [tp, C, H, W]
    x = x.reshape(1, tp, C, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (x.reshape(gh * gw, C * tp * p * p).astype(np.float32),
            (1, gh, gw))


def patchify_video(frames: np.ndarray, cfg: OmniVisionConfig
                   ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """[F, H, W, C] frames -> (patch vectors, grid_thw); F padded up to a
    temporal_patch_size multiple by repeating the last frame (HF
    processor behavior)."""
    p, m, tp = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    F, H, W, C = frames.shape
    if F % tp:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], tp - F % tp, axis=0)], axis=0)
        F = frames.shape[0]
    gt, gh, gw = F // tp, H // p, W // p
    x = frames.transpose(0, 3, 1, 2).reshape(gt, tp, C, H, W)
    x = x.reshape(gt, tp, C, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (x.reshape(gt * gh * gw, C * tp * p * p).astype(np.float32),
            (gt, gh, gw))


def vision_window_meta(grid_thw: Tuple[int, int, int],
                       cfg: OmniVisionConfig):
    """Host port of Qwen2_5OmniVisionEncoder.{rot_pos_emb,get_window_index}
    for one image/video: returns (window_index [S/4] int, seg_window [S],
    seg_full [S], rot [S, head_dim/2] fp32) with tokens ALREADY in window
    order for seg/rot."""
    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    llm_h, llm_w = h // m, w // m
    # rotary position ids in the original (pre-window) token order
    hpos = np.arange(h).reshape(h // m, m, 1, 1)
    hpos = np.broadcast_to(hpos, (h // m, m, w // m, m))
    hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
    wpos = np.arange(w).reshape(1, 1, w // m, m)
    wpos = np.broadcast_to(wpos, (h // m, m, w // m, m))
    wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
    pos_ids = np.tile(np.stack([hpos, wpos], axis=-1), (t, 1))  # [S, 2]
    dim = cfg.head_dim // 2 // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, dtype=np.float32) / dim))
    max_grid = max(h, w)
    freq_table = np.outer(np.arange(max_grid, dtype=np.float32), inv)
    rot = freq_table[pos_ids].reshape(pos_ids.shape[0], -1)  # [S, hd/2]

    # window index (group granularity: spatial_merge_unit = m*m tokens)
    vit_win = cfg.window_size // m // cfg.patch_size
    idx = np.arange(t * llm_h * llm_w).reshape(t, llm_h, llm_w)
    pad_h = (-llm_h) % vit_win
    pad_w = (-llm_w) % vit_win
    nwh, nww = (llm_h + pad_h) // vit_win, (llm_w + pad_w) // vit_win
    padded = np.full((t, llm_h + pad_h, llm_w + pad_w), -100, np.int64)
    padded[:, :llm_h, :llm_w] = idx
    padded = padded.reshape(t, nwh, vit_win, nww, vit_win)
    padded = padded.transpose(0, 1, 3, 2, 4).reshape(
        t, nwh * nww, vit_win, vit_win)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]

    unit = m * m
    seg_window = np.repeat(np.arange(len(seqlens)), seqlens * unit)
    # HF cu_seqlens for full attention: repeat_interleave(h*w, t) — one
    # segment PER TEMPORAL GRID (each t index attends within its frame pair)
    seg_full = np.repeat(np.arange(t), h * w)

    order = np.repeat(window_index * unit, unit) + np.tile(
        np.arange(unit), len(window_index))
    rot_ordered = rot[order]
    seg_full_ordered = seg_full[order]
    return (window_index.astype(np.int32), seg_window.astype(np.int32),
            seg_full_ordered.astype(np.int32), rot_ordered.astype(np.float32),
            order.astype(np.int32))


class _VisionAttention(nn.Module):
    cfg: OmniVisionConfig

    @nn.compact
    def __call__(self, x, rot, seg):
        c = self.cfg
        S, C = x.shape
        H, D = c.num_heads, c.head_dim
        q = nn.Dense(C, dtype=c.dtype, name="q")(x).reshape(S, H, D)
        k = nn.Dense(C, dtype=c.dtype, name="k")(x).reshape(S, H, D)
        v = nn.Dense(C, dtype=c.dtype, name="v")(x).reshape(S, H, D)

        cos = jnp.cos(rot)
        sin = jnp.sin(rot)
        cos2 = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
        sin2 = jnp.concatenate([sin, sin], axis=-1)[:, None, :]

        def rope(t):
            tf = t.astype(jnp.float32)
            d2 = D // 2
            rh = jnp.concatenate([-tf[..., d2:], tf[..., :d2]], axis=-1)
            return (tf * cos2 + rh * sin2).astype(t.dtype)

        q, k = rope(q), rope(k)
        logits = jnp.einsum("shd,zhd->hsz", q, k).astype(jnp.float32)
        logits = logits / (D ** 0.5)
        mask = seg[:, None] == seg[None, :]
        logits = jnp.where(mask[None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("hsz,zhd->shd", probs, v).reshape(S, C)
        return nn.Dense(C, dtype=c.dtype, name="proj")(out)


class _VisionBlock(nn.Module):
    cfg: OmniVisionConfig

    @nn.compact
    def __call__(self, x, rot, seg):
        c = self.cfg
        w1 = self.param("norm1", nn.initializers.ones, (c.hidden_size,),
                        jnp.float32)
        w2 = self.param("norm2", nn.initializers.ones, (c.hidden_size,),
                        jnp.float32)
        x = x + _VisionAttention(c, name="attn")(
            rms_norm(x, w1, 1e-6), rot, seg)
        h = rms_norm(x, w2, 1e-6)
        gate = nn.Dense(c.intermediate_size, dtype=c.dtype,
                        name="mlp_gate")(h)
        up = nn.Dense(c.intermediate_size, dtype=c.dtype, name="mlp_up")(h)
        down = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_down")(
            nn.silu(gate) * up)
        return x + down


class OmniVisionEncoder(nn.Module):
    """__call__(patches [S, C*tp*p*p] WINDOW-ORDERED, rot [S, hd/2],
    seg_window [S], seg_full [S]) -> merged tokens [S/4, out] in window
    order (host applies the reverse permutation)."""

    config: OmniVisionConfig

    @nn.compact
    def __call__(self, patches, rot, seg_window, seg_full):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                     name="patch_embed")(patches.astype(cfg.dtype))
        for i in range(cfg.depth):
            seg = seg_full if i in cfg.fullatt_block_indexes else seg_window
            x = _VisionBlock(cfg, name=f"block_{i}")(x, rot, seg)
        wq = self.param("ln_q", nn.initializers.ones, (cfg.hidden_size,),
                        jnp.float32)
        x = rms_norm(x, wq, 1e-6)
        unit = cfg.spatial_merge_size ** 2
        x = x.reshape(x.shape[0] // unit, unit * cfg.hidden_size)
        x = nn.Dense(unit * cfg.hidden_size, dtype=cfg.dtype,
                     name="merge_fc1")(x)
        return nn.Dense(cfg.out_hidden_size, dtype=cfg.dtype,
                        name="merge_fc2")(nn.gelu(x))


def encode_vision_host(enc: OmniVisionEncoder, params, patches: np.ndarray,
                       grid_thw: Tuple[int, int, int]) -> jnp.ndarray:
    """patches [S, ...] in HF processor order -> [S/4, out] in the original
    (pre-window) merged-token order."""
    cfg = enc.config
    window_index, seg_w, seg_f, rot, order = vision_window_meta(grid_thw, cfg)
    ordered = patches[order]
    out = enc.apply(params, jnp.asarray(ordered), jnp.asarray(rot),
                    jnp.asarray(seg_w), jnp.asarray(seg_f))
    reverse = np.argsort(window_index)
    return out[jnp.asarray(reverse)]


# ------------------------------------------------- 3-D positions (m-RoPE)

@dataclasses.dataclass
class MMSegment:
    """One span of the thinker input: kind in {'text','image','video',
    'audio'}; n_tokens for text/audio; grid_thw (+ seconds per temporal
    grid) for vision."""
    kind: str
    n_tokens: int = 0
    grid_thw: Optional[Tuple[int, int, int]] = None
    second_per_grid: float = 1.0


def build_mrope_positions(segments: Sequence[MMSegment],
                          spatial_merge_size: int = 2,
                          position_id_per_seconds: int = 25
                          ) -> np.ndarray:
    """Port of Qwen2_5Omni get_rope_index's position construction
    (modeling_qwen2_5_omni.py:189) over an explicit segment list (we build
    the sequence ourselves, so no token-id scanning is needed): text and
    audio advance all three streams together; vision spans get
    (t*k, h, w) grids offset by the running max+1. Returns [3, T]."""
    out = []
    st_idx = 0
    for seg in segments:
        if seg.kind in ("text", "audio"):
            n = seg.n_tokens
            pos = np.arange(n)[None].repeat(3, 0) + st_idx
        elif seg.kind in ("image", "video"):
            t, h, w = seg.grid_thw
            lh, lw = h // spatial_merge_size, w // spatial_merge_size
            t_index = (np.arange(t) * seg.second_per_grid *
                       position_id_per_seconds).astype(np.int64)
            tt = np.repeat(t_index, lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), t)
            ww = np.tile(np.arange(lw), t * lh)
            pos = np.stack([tt, hh, ww]) + st_idx
        else:
            raise ValueError(seg.kind)
        out.append(pos)
        st_idx = int(pos.max()) + 1
    return np.concatenate(out, axis=1)


# ----------------------------------------------------------------- thinker

AUDIO_PLACEHOLDER = "<AUDIO-Placeholder>"
IMAGE_PLACEHOLDER = "<IMAGE-Placeholder>"
VIDEO_PLACEHOLDER = "<VIDEO-Placeholder>"


class QwenOmniThinker:
    """Bundles the towers + qwen2 decoder; produces text from any mix of
    text/audio/image/video inputs. Towers run through the faithful
    encode_*_host wrappers; the decoder uses 3-D m-RoPE positions built
    from the spliced segment structure."""

    def __init__(self, llm: LlamaForCausalLM, llm_params, tokenizer,
                 audio_enc: Optional[OmniAudioEncoder] = None,
                 audio_params=None,
                 vision_enc: Optional[OmniVisionEncoder] = None,
                 vision_params=None,
                 max_new_tokens: int = 512):
        self.llm = llm
        self.llm_params = llm_params
        self.tokenizer = tokenizer
        self.audio_enc = audio_enc
        self.audio_params = audio_params
        self.vision_enc = vision_enc
        self.vision_params = vision_params
        self.max_new_tokens = max_new_tokens
        self._gen = None

    def encode_audio(self, mel: np.ndarray) -> jnp.ndarray:
        assert self.audio_enc is not None, "no audio tower loaded"
        return encode_audio_host(self.audio_enc, self.audio_params, mel)

    def encode_image(self, image: np.ndarray) -> Tuple[jnp.ndarray, tuple]:
        assert self.vision_enc is not None, "no vision tower loaded"
        patches, grid = patchify_image(np.asarray(image, np.float32),
                                       self.vision_enc.config)
        return encode_vision_host(self.vision_enc, self.vision_params,
                                  patches, grid), grid

    def encode_video(self, frames: np.ndarray) -> Tuple[jnp.ndarray, tuple]:
        assert self.vision_enc is not None, "no vision tower loaded"
        patches, grid = patchify_video(np.asarray(frames, np.float32),
                                       self.vision_enc.config)
        return encode_vision_host(self.vision_enc, self.vision_params,
                                  patches, grid), grid

    def chat(self, prompt: str, audios: Optional[Sequence[np.ndarray]] = None,
             images: Optional[Sequence[np.ndarray]] = None,
             videos: Optional[Sequence[np.ndarray]] = None,
             return_talker_streams: bool = False):
        """Splice modality embeds at placeholder markers (in order), build
        m-RoPE positions, and greedy-decode the answer.

        With return_talker_streams, also returns the talker conditioning
        streams the reference's speech path stitches in its `generate`
        (HF Qwen2_5OmniForConditionalGeneration.generate): prompt rows =
        last-layer hidden + token embeds (embeds zeroed at multimodal
        positions — HF zeroes only the layer-0 part), reply rows =
        hidden + embed of each fed-back generated token, plus the m-RoPE
        prompt positions."""
        import re

        segments: List[jnp.ndarray] = []
        mm_segments: List[MMSegment] = []
        embed = lambda ids: self.llm.apply(
            self.llm_params, jnp.asarray([ids], jnp.int32),
            method=self.llm.embed)[0]

        merge = (self.vision_enc.config.spatial_merge_size
                 if self.vision_enc is not None else 2)
        queues: Dict[str, list] = {
            AUDIO_PLACEHOLDER: list(audios or []),
            IMAGE_PLACEHOLDER: list(images or []),
            VIDEO_PLACEHOLDER: list(videos or []),
        }
        parts = re.split("({}|{}|{})".format(
            AUDIO_PLACEHOLDER, IMAGE_PLACEHOLDER, VIDEO_PLACEHOLDER), prompt)
        for part in parts:
            if part in queues:
                if not queues[part]:
                    raise ValueError(f"prompt has {part} but no matching "
                                     "input was provided")
                item = queues[part].pop(0)
                if part == AUDIO_PLACEHOLDER:
                    emb = self.encode_audio(item)
                    mm_segments.append(MMSegment("audio", emb.shape[0]))
                elif part == IMAGE_PLACEHOLDER:
                    emb, grid = self.encode_image(item)
                    mm_segments.append(MMSegment("image", grid_thw=grid))
                else:
                    emb, grid = self.encode_video(item)
                    mm_segments.append(MMSegment("video", grid_thw=grid))
                segments.append(emb)
            elif part:
                ids = self.tokenizer(part, add_special_tokens=False).input_ids
                if ids:
                    segments.append(embed(list(ids)))
                    mm_segments.append(MMSegment("text", len(ids)))
        for marker, q in queues.items():
            if q:
                raise ValueError(
                    f"{len(q)} {marker.strip('<>')} input(s) provided but the "
                    f"prompt has no {marker} marker — refusing to silently "
                    "drop multimodal inputs")

        embeds = jnp.concatenate(segments, axis=0)[None]
        positions = build_mrope_positions(mm_segments, merge)[:, None, :]
        if not return_talker_streams:
            return self._decode(embeds, positions)

        text, prompt_hidden, reply_rows = self._decode(embeds, positions,
                                                       capture=True)
        # HF zeroes the layer-0 (embedding) contribution at mm positions
        # before summing with the last-layer hidden.
        zeroed, off = np.asarray(embeds[0], np.float32).copy(), 0
        for seg in mm_segments:
            if seg.kind in ("text", "audio"):
                n = seg.n_tokens
            else:
                t, h, w = seg.grid_thw
                n = t * (h // merge) * (w // merge)
            if seg.kind != "text":
                zeroed[off:off + n] = 0.0
            off += n
        streams = {
            "prompt_stream": prompt_hidden + zeroed,
            "reply_stream": reply_rows,
            "positions": np.asarray(positions),
        }
        return text, streams

    def _decode(self, embeds, positions, capture: bool = False):
        """Greedy decode with a KV cache; positions [3, 1, T] m-RoPE.

        capture=True additionally returns (prompt final-hidden rows [T, H],
        reply rows [n, H] = final-hidden + embed of each fed-back token)."""
        from spider_tpu.models.llama import init_kv_cache

        L = embeds.shape[1]
        eos = getattr(self.tokenizer, "eos_token_id", None)
        max_new = self.max_new_tokens
        cfg = self.llm.config
        cache = init_kv_cache(cfg, 1, L + max_new)
        if self._gen is None:
            llm = self.llm

            @jax.jit
            def prefill(params, embeds, positions, cache):
                logits, final, cache = llm.apply(
                    params, embeds, positions=positions,
                    kv_write_index=0, kv_cache=cache,
                    kv_len=jnp.asarray([embeds.shape[1]], jnp.int32),
                    method=llm.call_with_final)
                return (jnp.argmax(logits[:, -1], axis=-1),
                        final.astype(jnp.float32), cache)

            @jax.jit
            def run(params, tok0, pos0, kv_len0, cache):
                def step(carry, _):
                    tok, pos, kv_len, cache = carry
                    emb = llm.apply(params, tok[:, None], method=llm.embed)
                    logits, final, cache = llm.apply(
                        params, emb,
                        positions=jnp.broadcast_to(pos[None, :, None],
                                                   (3, 1, 1)),
                        kv_write_index=kv_len, kv_cache=cache,
                        kv_len=kv_len + 1, method=llm.call_with_final)
                    nxt = jnp.argmax(logits[:, -1], axis=-1)
                    row = (final[:, 0] + emb[:, 0]).astype(jnp.float32)
                    return (nxt, pos + 1, kv_len + 1, cache), (nxt, row)

                (_, _, _, cache), (toks, rows) = jax.lax.scan(
                    step, (tok0, pos0, kv_len0, cache), None, length=max_new)
                return toks[:, 0], rows[:, 0]

            self._gen = (prefill, run)

        prefill, run = self._gen
        tok0, prompt_hidden, cache = prefill(self.llm_params, embeds,
                                             jnp.asarray(positions), cache)
        # next text position: max position so far + 1 on every stream
        nxt_pos = int(np.asarray(positions).max()) + 1
        toks, rows = run(
            self.llm_params, tok0,
            jnp.full((1,), nxt_pos, jnp.int32),
            jnp.asarray([L], jnp.int32), cache)
        toks = np.asarray(toks)
        out = [int(tok0[0])] + [int(t) for t in toks]
        if eos is not None and eos in out:
            out = out[: out.index(eos)]
        text = self.tokenizer.decode(out)
        if not capture:
            return text
        # reply rows cover the fed-back tokens out[0..n-1]; scan step i
        # feeds out[i], so that's rows[:len(out)] (EOS is never fed back,
        # matching HF where reply rows = one per single-step forward).
        rows = np.asarray(rows, np.float32)[:len(out)]
        return text, np.asarray(prompt_hidden[0], np.float32), rows


def build_tiny_omni_thinker(tokenizer=None, rng=None) -> QwenOmniThinker:
    """CPU-testable random-init thinker with all three towers."""
    from spider_tpu.models.tokenizer import TinyTokenizer

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = tokenizer or TinyTokenizer()
    lcfg = dataclasses.replace(thinker_tiny_llm(),
                               vocab_size=max(len(tokenizer), 512))
    llm = LlamaForCausalLM(lcfg)
    lparams = llm.init(rng, jnp.ones((1, 8), jnp.int32))
    acfg = dataclasses.replace(omni_audio_tiny(),
                               output_dim=lcfg.hidden_size)
    audio = OmniAudioEncoder(acfg)
    aparams = audio.init(rng, jnp.zeros((1, acfg.n_window * 2,
                                         acfg.num_mel_bins)),
                         jnp.asarray([4], jnp.int32),
                         jnp.arange(2, dtype=jnp.int32))
    vcfg = dataclasses.replace(omni_vision_tiny(),
                               out_hidden_size=lcfg.hidden_size)
    vision = OmniVisionEncoder(vcfg)
    S = 16  # 4x4 patch grid
    hd2 = vcfg.head_dim // 2
    vparams = vision.init(rng,
                          jnp.zeros((S, vcfg.in_channels *
                                     vcfg.temporal_patch_size *
                                     vcfg.patch_size ** 2)),
                          jnp.zeros((S, hd2)),
                          jnp.zeros((S,), jnp.int32),
                          jnp.zeros((S,), jnp.int32))
    return QwenOmniThinker(llm, lparams, tokenizer, audio, aparams,
                           vision, vparams, max_new_tokens=16)


def build_full_omni_thinker(ckpt_path: Optional[str] = None,
                            dtype=jnp.bfloat16,
                            max_new_tokens: int = 512) -> QwenOmniThinker:
    """Full-size Qwen2.5-Omni-7B thinker. With ckpt_path, loads and
    converts the HF checkpoint (models/convert.py::convert_omni_thinker
    over the thinker.* weights); otherwise fast shape-true random init."""
    acfg = dataclasses.replace(omni_audio_full(), dtype=dtype)
    vcfg = dataclasses.replace(omni_vision_full(), dtype=dtype)
    lcfg = dataclasses.replace(thinker_llm_full(), dtype=dtype)
    audio = OmniAudioEncoder(acfg)
    vision = OmniVisionEncoder(vcfg)
    llm = LlamaForCausalLM(lcfg)

    if ckpt_path:
        from spider_tpu.models.convert import (convert_omni_thinker,
                                               load_torch_state_dict)

        sd = load_torch_state_dict(ckpt_path)
        aparams, vparams, lparams = convert_omni_thinker(
            sd, acfg, vcfg, lcfg)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype)
            if np.asarray(x).dtype == np.float32 else jnp.asarray(x), t)
        aparams, vparams, lparams = cast(aparams), cast(vparams), cast(lparams)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(ckpt_path)
    else:
        from spider_tpu.models.factory import random_params_like
        from spider_tpu.models.tokenizer import TinyTokenizer

        tokenizer = TinyTokenizer()
        rng = jax.random.PRNGKey(0)
        lparams = random_params_like(llm, rng, jnp.ones((1, 8), jnp.int32))
        aparams = random_params_like(
            audio, rng,
            jnp.zeros((1, acfg.n_window * 2, acfg.num_mel_bins)),
            jnp.asarray([8], jnp.int32), jnp.arange(4, dtype=jnp.int32))
        S = 16
        vparams = random_params_like(
            vision, rng,
            jnp.zeros((S, vcfg.in_channels * vcfg.temporal_patch_size *
                       vcfg.patch_size ** 2)),
            jnp.zeros((S, vcfg.head_dim // 2)),
            jnp.zeros((S,), jnp.int32), jnp.zeros((S,), jnp.int32))
    return QwenOmniThinker(llm, lparams, tokenizer, audio, aparams,
                           vision, vparams, max_new_tokens=max_new_tokens)


def build_omni_thinker_chat_fn(ckpt_path: Optional[str] = None):
    """Chat fn for qwen2.5omni_infer: converted full-size checkpoint when a
    path is given, tiny random-init otherwise (plumbing-correct)."""
    thinker = (build_full_omni_thinker(ckpt_path) if ckpt_path
               else build_tiny_omni_thinker())

    def chat_fn(prompt: str, audios=None, images=None, videos=None) -> str:
        return thinker.chat(prompt, audios=audios, images=images,
                            videos=videos)

    return chat_fn
