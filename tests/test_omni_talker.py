"""Qwen2.5-Omni talker (models/omni_talker.py): thinker streams -> codec
tokens (the speech half of the reference's flagship SpiderFree LLM,
/root/reference/qwen2.5omni_spider_web.py:468,591-600).

Same two tiers as tests/test_qwen_omni.py: smoke over the tiny random-init
talker, plus numeric parity of the converted decoder against the local
transformers Qwen2_5OmniTalkerForConditionalGeneration.
"""

import numpy as np
import pytest

from spider_tpu.models.omni_talker import (OmniTalker, OmniTalkerGenerator,
                                           TalkerSampling, build_tiny_talker,
                                           talker_tiny)


def _torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


def test_talker_forward_matches_transformers():
    """Converted talker (proj -> Qwen2 decoder with m-RoPE -> codec head)
    vs HF Qwen2_5OmniTalkerForConditionalGeneration on raw inputs_embeds
    (modeling_qwen2_5_omni.py Qwen2_5OmniTalkerForConditionalGeneration)."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniTalkerConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniTalkerForConditionalGeneration

    from spider_tpu.models.convert import convert_omni_talker

    V, E, H, T = 32, 48, 32, 10
    hcfg = Qwen2_5OmniTalkerConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, embedding_size=E, max_position_embeddings=256,
        rope_theta=1e6,
        rope_scaling={"mrope_section": [2, 1, 1], "rope_type": "default",
                      "type": "default"})
    hcfg._attn_implementation = "eager"
    tm = Qwen2_5OmniTalkerForConditionalGeneration(hcfg).eval()

    rng = np.random.RandomState(0)
    embeds = rng.randn(1, T, E).astype(np.float32)
    pos = np.stack([np.arange(T), np.arange(T) % 5,
                    np.arange(T) % 3])[:, None, :]
    with torch.no_grad():
        ref = tm(inputs_embeds=torch.tensor(embeds),
                 position_ids=torch.tensor(pos)).logits.numpy()

    import jax
    cfg = talker_tiny(vocab_size=V)
    assert (cfg.embedding_size, cfg.hidden_size) == (E, H)
    params = convert_omni_talker(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    logits, _ = OmniTalker(cfg).apply(params, jnp.asarray(embeds),
                                      positions=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0], atol=3e-5)


def test_talker_generate_smoke():
    """Tiny random-init talker end-to-end: prompt/reply thinker streams ->
    codec ids; deterministic under a fixed rng; respects max_new_tokens."""
    import jax

    talker, params = build_tiny_talker()
    cfg = talker.config
    gen = OmniTalkerGenerator(talker, params,
                              TalkerSampling(max_new_tokens=12))
    rng = np.random.RandomState(1)
    E = cfg.embedding_size
    prompt = rng.randn(6, E).astype(np.float32)
    reply = rng.randn(4, E).astype(np.float32)
    bos, eos, pad = (rng.randn(E).astype(np.float32) for _ in range(3))

    out1 = gen.generate(prompt, bos, reply, eos, pad,
                        rng=jax.random.PRNGKey(7))
    out2 = gen.generate(prompt, bos, reply, eos, pad,
                        rng=jax.random.PRNGKey(7))
    assert out1.dtype == np.int32 and len(out1) <= 13
    np.testing.assert_array_equal(out1, out2)
    # sampled ids live in the codec vocab and never include bos/eos/pad
    for t in out1:
        assert 0 <= t < cfg.vocab_size
        assert t not in (cfg.codec_bos, cfg.codec_eos, cfg.codec_pad)


def test_talker_generate_mrope_prefill_positions():
    """Custom [3,1,T] m-RoPE prefill positions are accepted and decode
    continues from max(position)+1 (HF rope_deltas semantics)."""
    import jax

    talker, params = build_tiny_talker()
    cfg = talker.config
    gen = OmniTalkerGenerator(talker, params,
                              TalkerSampling(max_new_tokens=4))
    rng = np.random.RandomState(2)
    E = cfg.embedding_size
    prompt = rng.randn(3, E).astype(np.float32)
    reply = rng.randn(2, E).astype(np.float32)
    bos, eos, pad = (rng.randn(E).astype(np.float32) for _ in range(3))
    T = prompt.shape[0] + 2
    pos = np.stack([np.arange(T), np.arange(T) % 2,
                    np.arange(T) % 3])[:, None, :]
    out = gen.generate(prompt, bos, reply, eos, pad, prefill_positions=pos,
                       rng=jax.random.PRNGKey(0))
    assert out.dtype == np.int32
