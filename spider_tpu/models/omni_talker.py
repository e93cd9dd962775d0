"""Qwen2.5-Omni "talker", TPU-native flax — speech-codec tokens from the
thinker's reply.

The reference's SpiderFree web demo returns text AND speech audio from one
Omni generate call (/root/reference/qwen2.5omni_spider_web.py:468,591-600).
The speech half is the talker: a Qwen2-architecture autoregressive decoder
that consumes, per position, the SUM of a codec-token embedding and a
"thinker stream" row (thinker last-layer hidden + token embedding for that
position), projects it into the talker width, and predicts the next
discrete speech-codec token. Faithful to transformers'
Qwen2_5OmniTalkerForConditionalGeneration (modeling_qwen2_5_omni.py):

  * prefill inputs  = [thinker prompt hidden+embed rows,
                       speaker text-BOS embed, first reply row], with the
    codec PAD embedding added at position -2 and codec BOS at -1;
  * each decode step embeds the previously sampled codec token and adds
    the next thinker-reply row (reply rows are followed by the thinker's
    text-EOS and then text-PAD embeds; the final PAD row repeats once the
    stream is exhausted);
  * every position goes through thinker_to_talker_proj before the decoder;
  * logits = codec_head(hidden) over the codec vocabulary (8448: 8192
    codebook entries + special ids);
  * sampling (HF generate defaults): repetition_penalty 1.05 over all
    previously seen ids, suppress codec BOS, temperature 0.9, top-k 40,
    top-p 0.8; stop on codec EOS (8294) or codec PAD (8292).

The decoder body reuses models/llama.py's scanned LlamaModel (Qwen2 shape:
q/k/v bias, GQA, m-RoPE section support), so TP/quantization/partition
rules apply to the talker for free. Token-to-waveform synthesis lives in
models/omni_token2wav.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.llama import LlamaConfig, LlamaModel, init_kv_cache


@dataclasses.dataclass(frozen=True)
class OmniTalkerConfig:
    # decoder (Qwen2 family) — defaults follow transformers'
    # Qwen2_5OmniTalkerConfig defaults
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    mrope_section: Optional[Tuple[int, ...]] = None
    # the talker embeds codec tokens at the THINKER's width so they can be
    # summed with thinker hidden/embedding rows before projection
    embedding_size: int = 3584
    vocab_size: int = 8448           # codec codebook + special ids
    # special codec ids (tts_codec_*_token_id)
    codec_bos: int = 8293
    codec_eos: int = 8294
    codec_pad: int = 8292
    codec_mask: int = 8296
    # tts text ids in the THINKER's vocabulary (tts_text_*_token_id);
    # embedded through the thinker's embed_tokens by the speech pipeline
    text_bos: int = 151860
    text_eos: int = 151861
    text_pad: int = 151859
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    def as_llama(self) -> LlamaConfig:
        return LlamaConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            head_dim=self.head_dim,
            rope_theta=self.rope_theta,
            rms_norm_eps=self.rms_norm_eps,
            attention_bias=True,
            mrope_section=self.mrope_section,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            quantization=self.quantization,
        )


def talker_full() -> OmniTalkerConfig:
    # the released 7B checkpoint carries mrope_section [16, 24, 24]
    # (config.json talker_config.rope_scaling), matching the thinker
    return OmniTalkerConfig(mrope_section=(16, 24, 24))


def talker_tiny(vocab_size: int = 32) -> OmniTalkerConfig:
    return OmniTalkerConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        mrope_section=(2, 1, 1), embedding_size=48, vocab_size=vocab_size,
        codec_bos=vocab_size - 3, codec_eos=vocab_size - 2,
        codec_pad=vocab_size - 4, codec_mask=vocab_size - 1,
        text_bos=5, text_eos=6, text_pad=7,
        dtype=jnp.float32)


class OmniTalker(nn.Module):
    """inputs_embeds [B, T, embedding_size] -> codec logits [B, T, vocab].

    inputs_embeds are built by the CALLER (generator below) as
    codec-embedding + thinker-stream sums, matching the HF forward which
    projects `inputs_embeds` with thinker_to_talker_proj then runs the
    decoder (modeling_qwen2_5_omni.py Qwen2_5OmniTalkerForConditionalGeneration.forward).
    """

    config: OmniTalkerConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.embedding_size, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="embed_tokens")
        self.thinker_to_talker_proj = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="thinker_to_talker_proj")
        self.model = LlamaModel(cfg.as_llama(), name="model")
        self.codec_head = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="codec_head")

    def embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(ids)

    def init_all(self, inputs_embeds):
        """Init-only entry: touches embed_tokens too (the main __call__
        takes pre-summed embeds, so plain init would skip its params)."""
        _ = self.embed_tokens(jnp.zeros((1, 1), jnp.int32))
        return self(inputs_embeds)

    def __call__(self, inputs_embeds, positions=None, kv_write_index=0,
                 kv_cache=None, kv_len=None):
        cfg = self.config
        x = self.thinker_to_talker_proj(inputs_embeds.astype(cfg.dtype))
        B, T = x.shape[:2]
        if positions is None:
            positions = jnp.arange(T, dtype=jnp.int32)[None, :] + kv_write_index
        final, _, new_cache = self.model(x, positions, kv_write_index,
                                         kv_cache, kv_len)
        logits = self.codec_head(final)
        return logits, new_cache


# --------------------------------------------------------------- generation

@dataclasses.dataclass
class TalkerSampling:
    """HF Qwen2_5OmniForConditionalGeneration.generate talker defaults."""
    temperature: float = 0.9
    top_k: int = 40
    top_p: float = 0.8
    repetition_penalty: float = 1.05
    max_new_tokens: int = 4096


class OmniTalkerGenerator:
    """Autoregressive codec-token generation, jitted prefill + scan decode.

    Mirrors the host-side stitching in the HF `generate`
    (modeling_qwen2_5_omni.py Qwen2_5OmniForConditionalGeneration.generate):
    the caller supplies the thinker streams, this class adds the codec
    BOS/PAD embeddings, runs the decoder, and samples with repetition
    penalty + BOS suppression + temperature/top-k/top-p.
    """

    def __init__(self, talker: OmniTalker, params,
                 sampling: Optional[TalkerSampling] = None):
        self.talker = talker
        self.params = params
        self.s = sampling or TalkerSampling()
        self._fns = None

    def _build(self, max_new: int):
        talker = self.talker
        cfg = talker.config
        s = self.s
        eos_ids = (cfg.codec_eos, cfg.codec_pad)

        @jax.jit
        def prefill(params, embeds, positions, cache):
            logits, cache = talker.apply(
                params, embeds, positions=positions, kv_write_index=0,
                kv_cache=cache,
                kv_len=jnp.asarray([embeds.shape[1]], jnp.int32))
            return logits[:, -1], cache

        def sample(logits, presence, key):
            """[V] logits -> sampled id, in the HF processor order."""
            pen = jnp.where(logits < 0, logits * s.repetition_penalty,
                            logits / s.repetition_penalty)
            logits = jnp.where(presence, pen, logits)
            logits = logits.at[cfg.codec_bos].set(-jnp.inf)
            logits = logits / s.temperature
            if s.top_k and s.top_k < cfg.vocab_size:
                kth = jax.lax.top_k(logits, s.top_k)[0][-1]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            if s.top_p < 1.0:
                srt = jnp.sort(logits)[::-1]
                cum = jnp.cumsum(jax.nn.softmax(srt))
                cutoff = jnp.sum(cum < s.top_p)
                logits = jnp.where(logits < srt[cutoff], -jnp.inf, logits)
            return jax.random.categorical(key, logits).astype(jnp.int32)

        @jax.jit
        def decode(params, tok0, pos0, kv_len0, cache, reply_stream,
                   presence, key):
            R = reply_stream.shape[0]

            def step(carry, i):
                cache, kv_len, pos, last, presence, key, alive = carry
                extra = jax.lax.dynamic_index_in_dim(
                    reply_stream, jnp.minimum(i, R - 1), keepdims=False)
                emb = talker.apply(params, last[None],
                                   method=talker.embed) + extra[None]
                logits, cache = talker.apply(
                    params, emb[:, None],
                    positions=jnp.broadcast_to(pos[None, None, None],
                                               (3, 1, 1)),
                    kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1)
                key, sub = jax.random.split(key)
                nxt = sample(logits[0, -1].astype(jnp.float32),
                             presence, sub)
                nxt = jnp.where(alive, nxt, cfg.codec_pad)
                presence = presence.at[nxt].set(True)
                alive = jnp.logical_and(
                    alive, jnp.logical_and(nxt != eos_ids[0],
                                           nxt != eos_ids[1]))
                return (cache, kv_len + 1, pos + 1, nxt, presence, key,
                        alive), nxt

            (_, _, _, _, _, _, _), toks = jax.lax.scan(
                step,
                (cache, kv_len0, pos0, tok0, presence, key,
                 jnp.asarray(True)),
                jnp.arange(max_new))
            return toks

        return prefill, sample, decode

    def generate(self, prompt_stream: np.ndarray, text_bos_embed: np.ndarray,
                 reply_stream: np.ndarray, eos_embed: np.ndarray,
                 pad_embed: np.ndarray,
                 prefill_positions: Optional[np.ndarray] = None,
                 max_new_tokens: Optional[int] = None,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """prompt_stream [P, E]: thinker prompt hidden+embed rows (mm rows
        zeroed by the caller); text_bos_embed/eos_embed/pad_embed [E];
        reply_stream [R, E]: hidden+embed rows of the thinker's generated
        tokens. Returns the sampled codec ids (eos trimmed)."""
        cfg = self.talker.config
        s = self.s
        max_new = int(max_new_tokens or s.max_new_tokens)
        P = prompt_stream.shape[0]

        if self._fns is None:
            self._fns = {}
        if max_new not in self._fns:
            self._fns[max_new] = self._build(max_new)
        prefill, _, decode = self._fns[max_new]

        embed = lambda tid: np.asarray(self.talker.apply(
            self.params, jnp.asarray([tid], jnp.int32),
            method=self.talker.embed))[0]
        # prefill embeds: [prompt, text_bos, reply0] (+ codec pad @-2, bos @-1).
        # An empty reply (thinker emitted EOS immediately) has no reply0 row;
        # reuse the text-BOS embedding so the codec bos/pad adds land on the
        # intended last-two rows instead of corrupting the prompt tail.
        reply_head = (np.asarray(reply_stream[:1], np.float32)
                      if len(reply_stream) else
                      np.asarray(text_bos_embed, np.float32)[None])
        pre = np.concatenate(
            [np.asarray(prompt_stream, np.float32),
             np.asarray(text_bos_embed, np.float32)[None],
             reply_head], axis=0)
        pre[-2] = pre[-2] + embed(cfg.codec_pad)
        pre[-1] = pre[-1] + embed(cfg.codec_bos)
        T = pre.shape[0]
        if prefill_positions is None:
            positions = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None, None, :], (3, 1, T))
        else:
            positions = jnp.asarray(prefill_positions, jnp.int32)
            assert positions.shape == (3, 1, T), positions.shape

        cache = init_kv_cache(self.talker.config.as_llama(), 1, T + max_new)
        logits0, cache = prefill(self.params, jnp.asarray(pre)[None],
                                 positions, cache)

        # decode-time thinker stream: reply[1:] ++ text_eos ++ text_pad
        # (last row repeats when exhausted — HF keeps the final row)
        stream = np.concatenate(
            [np.asarray(reply_stream[1:], np.float32),
             np.asarray(eos_embed, np.float32)[None],
             np.asarray(pad_embed, np.float32)[None]], axis=0)

        presence = np.zeros((cfg.vocab_size,), bool)
        presence[[cfg.codec_mask, cfg.codec_pad, cfg.codec_bos]] = True

        key = rng if rng is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        _, sample, _ = self._fns[max_new]
        tok0 = sample(logits0[0].astype(jnp.float32),
                      jnp.asarray(presence), sub)
        presence[int(tok0)] = True
        if int(tok0) in (cfg.codec_eos, cfg.codec_pad):
            return np.zeros((0,), np.int32)

        nxt_pos = int(np.asarray(positions).max()) + 1
        toks = np.asarray(decode(
            self.params, tok0, jnp.asarray(nxt_pos, jnp.int32),
            jnp.asarray([T], jnp.int32), cache, jnp.asarray(stream),
            jnp.asarray(presence), key))
        out = [int(tok0)]
        for t in toks:
            if int(t) in (cfg.codec_eos, cfg.codec_pad):
                break
            out.append(int(t))
        return np.asarray(out, np.int32)


def build_tiny_talker(rng: Optional[jax.Array] = None):
    """Random-init tiny talker (shapes-only; for tests/smokes)."""
    from spider_tpu.models.factory import random_params_like

    cfg = talker_tiny()
    talker = OmniTalker(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = random_params_like(
        talker, rng, jnp.zeros((1, 4, cfg.embedding_size)),
        method="init_all")
    return talker, jax.tree_util.tree_map(jnp.asarray, params)
