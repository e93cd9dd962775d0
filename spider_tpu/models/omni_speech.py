"""Qwen2.5-Omni end-to-end speech pipeline: thinker -> talker -> token2wav.

The reference's flagship SpiderFree LLM returns text AND speech audio from
one Omni generate call (/root/reference/qwen2.5omni_spider_web.py:468 uses
`model.generate(...)` -> (text_ids, audio); the audio is streamed out at
:591-600). That call is transformers' Qwen2_5OmniForConditionalGeneration
.generate, which stitches three models; this module is the TPU-native
composition of our three equivalents:

  1. thinker (models/qwen_omni.QwenOmniThinker) decodes the text reply and
     captures the talker conditioning streams (per-position last-layer
     hidden + token embedding);
  2. talker (models/omni_talker.OmniTalker) autoregressively emits
     speech-codec tokens from those streams, with the speaker's text-BOS
     row spliced between prompt and reply;
  3. token2wav (models/omni_token2wav.OmniToken2Wav) turns codec tokens
     into mel (DiT flow matching, speaker-conditioned) then waveform
     (BigVGAN).

Speaker conditioning mirrors the HF `spk_dict.pt` entries: a per-speaker
dict with `bos_token` (a tts-text id in the thinker vocabulary), `cond`
(the DiT conditioning vector) and `ref_mel` (the ECAPA reference mel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.omni_talker import (OmniTalker, OmniTalkerGenerator,
                                           TalkerSampling)
from spider_tpu.models.omni_token2wav import OmniToken2Wav
from spider_tpu.models.qwen_omni import QwenOmniThinker


@dataclasses.dataclass
class OmniSpeaker:
    """One entry of the reference's speaker dictionary (HF spk_dict.pt)."""

    bos_token: int                 # tts text-BOS id in the thinker vocab
    cond: np.ndarray               # [1, enc_emb_dim] DiT conditioning
    ref_mel: np.ndarray            # [1, T_ref, mel_dim] ECAPA reference mel


class OmniSpeechPipeline:
    """chat_with_speech(): text reply + synthesized waveform.

    Mirrors Qwen2_5OmniForConditionalGeneration.generate
    (modeling_qwen2_5_omni.py): thinker rows are summed hidden+embed
    streams; the talker prefill is [prompt rows, speaker text-BOS row,
    first reply row] with codec PAD/BOS embeddings added at the last two
    positions; decode feeds reply rows then text-EOS then text-PAD; the
    sampled codec ids drive the DiT/BigVGAN token2wav."""

    def __init__(self, thinker: QwenOmniThinker, talker: OmniTalker,
                 talker_params, token2wav: OmniToken2Wav,
                 speakers: Optional[Dict[str, OmniSpeaker]] = None,
                 sampling: Optional[TalkerSampling] = None):
        self.thinker = thinker
        self.talker = talker
        self.token2wav = token2wav
        self.speakers = speakers or {}
        self.generator = OmniTalkerGenerator(talker, talker_params, sampling)

    def _embed_text_id(self, tid: int) -> np.ndarray:
        """Embed a thinker-vocabulary id through the thinker embed table
        (HF embeds the tts text ids with thinker.model.embed_tokens)."""
        llm = self.thinker.llm
        row = llm.apply(self.thinker.llm_params,
                        jnp.asarray([[tid]], jnp.int32), method=llm.embed)
        return np.asarray(row, np.float32)[0, 0]

    def speak(self, streams: Dict[str, np.ndarray],
              speaker: Optional[OmniSpeaker] = None,
              max_speech_tokens: Optional[int] = None,
              num_flow_steps: int = 10, guidance_scale: float = 0.5,
              rng: Optional[jax.Array] = None) -> np.ndarray:
        """Talker + token2wav over captured thinker streams -> waveform."""
        cfg = self.talker.config
        if speaker is None:
            if self.speakers:
                speaker = next(iter(self.speakers.values()))
            else:  # default voice: generic text-BOS, neutral conditioning
                dcfg = self.token2wav.dit.config
                speaker = OmniSpeaker(
                    bos_token=cfg.text_bos,
                    cond=np.zeros((1, dcfg.enc_emb_dim), np.float32),
                    ref_mel=np.zeros((1, 2 * dcfg.block_size, dcfg.mel_dim),
                                     np.float32))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        talker_rng, wav_rng = jax.random.split(rng)

        # extend the thinker's m-RoPE prompt positions with two sequential
        # rows (speaker text-BOS + first reply) on all three streams — HF
        # continues text-style positions after the multimodal prompt
        pos = np.asarray(streams["positions"], np.int32)  # [3, 1, P]
        nxt = int(pos.max()) + 1
        ext = np.broadcast_to(np.asarray([nxt, nxt + 1], np.int32),
                              (3, 1, 2))
        prefill_positions = np.concatenate([pos, ext], axis=-1)

        codes = self.generator.generate(
            streams["prompt_stream"],
            self._embed_text_id(int(speaker.bos_token)),
            streams["reply_stream"],
            self._embed_text_id(cfg.text_eos),
            self._embed_text_id(cfg.text_pad),
            prefill_positions=prefill_positions,
            max_new_tokens=max_speech_tokens, rng=talker_rng)
        if codes.size == 0:
            return np.zeros((0,), np.float32)
        return np.asarray(self.token2wav(
            codes[None], speaker.cond, speaker.ref_mel,
            num_steps=num_flow_steps, guidance_scale=guidance_scale,
            rng=wav_rng), np.float32)

    def chat_with_speech(self, prompt: str, audios=None, images=None,
                         videos=None, speaker: Optional[str] = None,
                         max_speech_tokens: Optional[int] = None,
                         num_flow_steps: int = 10,
                         guidance_scale: float = 0.5,
                         rng: Optional[jax.Array] = None):
        """Returns (reply text, waveform float32 [T_wav])."""
        text, streams = self.thinker.chat(
            prompt, audios=audios, images=images, videos=videos,
            return_talker_streams=True)
        spk = self.speakers.get(speaker) if speaker else None
        if speaker and spk is None:
            raise KeyError(f"unknown speaker {speaker!r}; have "
                           f"{sorted(self.speakers)}")
        wav = self.speak(streams, speaker=spk,
                         max_speech_tokens=max_speech_tokens,
                         num_flow_steps=num_flow_steps,
                         guidance_scale=guidance_scale, rng=rng)
        return text, wav


# ------------------------------------------------------------------ builders

def build_tiny_omni_speech(rng: Optional[jax.Array] = None
                           ) -> OmniSpeechPipeline:
    """CPU-testable random-init pipeline (tiny thinker/talker/token2wav)."""
    from spider_tpu.models.factory import random_params_like
    from spider_tpu.models.omni_talker import talker_tiny
    from spider_tpu.models.omni_token2wav import build_tiny_token2wav
    from spider_tpu.models.qwen_omni import build_tiny_omni_thinker

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    thinker = build_tiny_omni_thinker(rng=r1)
    # the talker embeds codec tokens at the THINKER's width (streams sum)
    tcfg = dataclasses.replace(talker_tiny(),
                               embedding_size=thinker.llm.config.hidden_size)
    talker = OmniTalker(tcfg)
    tparams = jax.tree_util.tree_map(jnp.asarray, random_params_like(
        talker, r2, jnp.zeros((1, 4, tcfg.embedding_size)),
        method="init_all"))
    token2wav = build_tiny_token2wav(rng=r3)
    return OmniSpeechPipeline(thinker, talker, tparams, token2wav)


def build_full_omni_speech(ckpt_path: Optional[str] = None,
                           spk_path: Optional[str] = None,
                           dtype: Any = jnp.bfloat16,
                           max_new_tokens: int = 512) -> OmniSpeechPipeline:
    """Full-size Qwen2.5-Omni-7B pipeline. With ckpt_path, converts the HF
    checkpoint (thinker.* / talker.* / token2wav.* key spaces, see
    models/convert.py); otherwise fast shape-true random init. spk_path
    points at the HF spk_dict.pt speaker dictionary."""
    from spider_tpu.models.omni_talker import talker_full
    from spider_tpu.models.omni_token2wav import (BigVGAN, DiTModel,
                                                  bigvgan_full, dit_full)
    from spider_tpu.models.qwen_omni import build_full_omni_thinker

    thinker = build_full_omni_thinker(ckpt_path, dtype=dtype,
                                      max_new_tokens=max_new_tokens)
    tcfg = dataclasses.replace(talker_full(), dtype=dtype)
    talker = OmniTalker(tcfg)
    dcfg, bcfg = dit_full(), bigvgan_full()
    dit, voc = DiTModel(dcfg), BigVGAN(bcfg)

    if ckpt_path:
        from spider_tpu.models.convert import (convert_omni_bigvgan,
                                               convert_omni_dit,
                                               convert_omni_talker,
                                               load_torch_state_dict)

        sd = load_torch_state_dict(ckpt_path)
        tparams = convert_omni_talker(sd, tcfg)
        dparams = convert_omni_dit(sd, dcfg)
        vparams = convert_omni_bigvgan(sd, bcfg)
    else:
        from spider_tpu.models.factory import random_params_like

        rng = jax.random.PRNGKey(1)
        r1, r2, r3 = jax.random.split(rng, 3)
        tparams = random_params_like(
            talker, r1, jnp.zeros((1, 4, tcfg.embedding_size)),
            method="init_all")
        dparams = random_params_like(
            dit, r2, jnp.zeros((1, 8, dcfg.mel_dim)),
            jnp.zeros((1, 8, dcfg.enc_emb_dim)),
            jnp.zeros((1, 6, dcfg.mel_dim)),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)))
        vparams = random_params_like(voc, r3,
                                     jnp.zeros((1, 8, bcfg.mel_dim)))
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    token2wav = OmniToken2Wav(dit, to_j(dparams), voc, to_j(vparams))

    speakers: Dict[str, OmniSpeaker] = {}
    if spk_path:
        import torch

        for name, entry in torch.load(spk_path, map_location="cpu",
                                      weights_only=True).items():
            speakers[name] = OmniSpeaker(
                bos_token=int(entry["bos_token"]),
                cond=np.asarray(entry["cond"], np.float32).reshape(1, -1),
                ref_mel=np.asarray(entry["ref_mel"], np.float32)[None]
                if np.asarray(entry["ref_mel"]).ndim == 2
                else np.asarray(entry["ref_mel"], np.float32))
    return OmniSpeechPipeline(thinker, talker, to_j(tparams), token2wav,
                              speakers=speakers)
