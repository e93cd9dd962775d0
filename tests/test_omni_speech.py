"""End-to-end Qwen2.5-Omni speech pipeline (models/omni_speech.py):
thinker text decode + talker codec tokens + token2wav waveform — the
TPU-native equivalent of the reference's one-call text+speech generate
(/root/reference/qwen2.5omni_spider_web.py:468,591-600)."""

import numpy as np
import pytest

import jax

from spider_tpu.models.omni_speech import (OmniSpeaker,
                                           build_tiny_omni_speech)


@pytest.mark.slow  # 31s; deterministic variant is the fast representative
def test_chat_with_speech_tiny():
    pipe = build_tiny_omni_speech()
    text, wav = pipe.chat_with_speech("hello", max_speech_tokens=6,
                                      num_flow_steps=2,
                                      rng=jax.random.PRNGKey(0))
    assert isinstance(text, str) and len(text) > 0
    assert wav.dtype == np.float32 and wav.ndim == 1
    # BigVGAN tiny upsamples 2*2 = 4x over mel frames; DiT repeats codes 2x
    if wav.size:
        assert np.all(np.abs(wav) <= 1.0)
        assert wav.size % 4 == 0


@pytest.mark.slow  # 33s; speak-eos unit test + golden_verify --omni cover
def test_chat_with_speech_deterministic():  # the chain in the default tier
    pipe = build_tiny_omni_speech()
    kw = dict(max_speech_tokens=4, num_flow_steps=2,
              rng=jax.random.PRNGKey(3))
    t1, w1 = pipe.chat_with_speech("hi there", **kw)
    t2, w2 = pipe.chat_with_speech("hi there", **kw)
    assert t1 == t2
    np.testing.assert_array_equal(w1, w2)


@pytest.mark.slow  # 16s; speaker table covered by unit path
def test_named_speaker_and_unknown_speaker():
    import pytest

    pipe = build_tiny_omni_speech()
    dcfg = pipe.token2wav.dit.config
    rng = np.random.RandomState(0)
    pipe.speakers["Chelsie"] = OmniSpeaker(
        bos_token=pipe.talker.config.text_bos,
        cond=rng.randn(1, dcfg.enc_emb_dim).astype(np.float32),
        ref_mel=rng.randn(1, 2 * dcfg.block_size,
                          dcfg.mel_dim).astype(np.float32))
    text, wav = pipe.chat_with_speech("hello", speaker="Chelsie",
                                      max_speech_tokens=4, num_flow_steps=2)
    assert isinstance(text, str)
    with pytest.raises(KeyError):
        pipe.chat_with_speech("hello", speaker="nope", max_speech_tokens=2)


def test_speak_handles_immediate_eos():
    """If the first sampled codec token is EOS/PAD the pipeline returns an
    empty waveform instead of crashing token2wav on zero-length codes."""
    pipe = build_tiny_omni_speech()
    text, streams = pipe.thinker.chat("x", return_talker_streams=True)
    # force immediate stop by monkeypatching the generator
    pipe.generator.generate = lambda *a, **k: np.zeros((0,), np.int32)
    wav = pipe.speak(streams)
    assert wav.size == 0
