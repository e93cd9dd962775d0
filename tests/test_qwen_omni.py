"""Native Qwen2.5-Omni thinker (models/qwen_omni.py): any-modality -> text
(BASELINE config #3).

Two tiers:
  * smoke tests over the tiny random-init thinker (towers + splicing +
    loud-failure semantics);
  * NUMERIC PARITY against the locally-installed transformers
    implementation (tiny random-init torch models, eager attention) —
    the converter golden rehearsal VERDICT r2 asked for: every converted
    weight and every architectural detail (chunked audio attention,
    windowed vision attention, m-RoPE) is checked end-to-end without
    needing the real checkpoint.
"""

import dataclasses

import numpy as np
import pytest

from spider_tpu.models.qwen_omni import (AUDIO_PLACEHOLDER, IMAGE_PLACEHOLDER,
                                         VIDEO_PLACEHOLDER, MMSegment,
                                         build_mrope_positions,
                                         build_tiny_omni_thinker)


@pytest.fixture(scope="module")
def thinker():
    return build_tiny_omni_thinker()


def test_text_only_chat(thinker):
    out = thinker.chat("hello world")
    assert isinstance(out, str)


@pytest.mark.slow
def test_multimodal_chat_all_modalities(thinker):
    mel = np.zeros((32, 16), np.float32)
    img = np.zeros((16, 16, 3), np.float32)
    vid = np.zeros((2, 16, 16, 3), np.float32)
    out = thinker.chat(
        f"describe {AUDIO_PLACEHOLDER} and {IMAGE_PLACEHOLDER} "
        f"and {VIDEO_PLACEHOLDER}",
        audios=[mel], images=[img], videos=[vid])
    assert isinstance(out, str)


def test_tower_token_shapes(thinker):
    a = thinker.encode_audio(np.zeros((32, 16), np.float32))
    # conv stride 2 then pool 2: 32 -> 16 -> 8 audio tokens
    assert a.shape == (8, 64)
    v, grid = thinker.encode_image(np.zeros((16, 16, 3), np.float32))
    # patch 4 -> 4x4 grid, 2x2 merge -> 4 tokens
    assert v.shape == (4, 64) and grid == (1, 4, 4)
    f, grid = thinker.encode_video(np.zeros((3, 16, 16, 3), np.float32))
    # 3 frames pad to 4, temporal_patch 2 -> grid_t 2 -> 2*16/4 = 8 tokens
    assert f.shape == (8, 64) and grid == (2, 4, 4)


def test_dropped_input_raises(thinker):
    img = np.zeros((16, 16, 3), np.float32)
    with pytest.raises(ValueError, match="no .*marker|refusing"):
        thinker.chat("describe this", images=[img])


def test_missing_input_raises(thinker):
    with pytest.raises(ValueError, match="no matching input"):
        thinker.chat(f"describe {IMAGE_PLACEHOLDER}")


# ---------------------------------------------------------------------------
# numeric parity vs transformers (tiny random-init, eager attention)
# ---------------------------------------------------------------------------

def _torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


def _tiny_hf_audio_cfg():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniAudioEncoderConfig

    cfg = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=16, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, d_model=32, max_source_positions=64, n_window=8,
        output_dim=48)
    cfg._attn_implementation = "eager"
    return cfg


def _tiny_hf_vision_cfg():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniVisionEncoderConfig

    cfg = Qwen2_5OmniVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
        window_size=16, out_hidden_size=48, fullatt_block_indexes=[1])
    cfg._attn_implementation = "eager"
    return cfg


@pytest.mark.slow  # 20s torch-parity tier
def test_audio_tower_matches_transformers():
    """Chunked conv + block-diagonal attention + pool/ln/proj vs the HF
    Qwen2_5OmniAudioEncoder, ragged tail chunk included
    (modeling_qwen2_5_omni.py:707)."""
    torch = _torch()
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniAudioEncoder

    from spider_tpu.models.convert import convert_omni_audio_tower
    from spider_tpu.models.qwen_omni import (OmniAudioConfig,
                                             OmniAudioEncoder,
                                             encode_audio_host)

    tm = Qwen2_5OmniAudioEncoder(_tiny_hf_audio_cfg()).eval()
    T_mel = 40  # 2 full 16-frame chunks + ragged 8-frame tail
    mel = np.random.RandomState(0).randn(T_mel, 16).astype(np.float32)
    with torch.no_grad():
        flens = torch.tensor([T_mel])
        ref = tm(torch.tensor(mel.T), feature_lens=flens,
                 aftercnn_lens=(flens - 1) // 2 + 1).last_hidden_state.numpy()

    cfg = OmniAudioConfig(num_mel_bins=16, d_model=32, num_layers=2,
                          num_heads=4, ffn_dim=64, n_window=8,
                          max_positions=64, output_dim=48)
    params = convert_omni_audio_tower(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg, prefix="")
    got = np.asarray(encode_audio_host(OmniAudioEncoder(cfg), params, mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_vision_tower_matches_transformers():
    """Windowed ViT (window reorder + block-diagonal attention + 2-D rotary
    + RMS blocks + merger) vs HF Qwen2_5OmniVisionEncoder on a NON-square
    grid whose window tiling is ragged (modeling_qwen2_5_omni.py:1073)."""
    torch = _torch()
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniVisionEncoder

    from spider_tpu.models.convert import convert_omni_vision_tower
    from spider_tpu.models.qwen_omni import (OmniVisionConfig,
                                             OmniVisionEncoder,
                                             encode_vision_host)

    tm = Qwen2_5OmniVisionEncoder(_tiny_hf_vision_cfg()).eval()
    S = 6 * 8   # 24x32 px image, llm grid 3x4, window 2 -> ragged padding
    patches = np.random.RandomState(0).randn(S, 3 * 2 * 4 * 4).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(patches),
                 grid_thw=torch.tensor([[1, 6, 8]])).numpy()

    cfg = OmniVisionConfig(depth=2, hidden_size=32, intermediate_size=64,
                           num_heads=4, patch_size=4, window_size=16,
                           out_hidden_size=48, fullatt_block_indexes=(1,))
    params = convert_omni_vision_tower(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg, prefix="")
    got = np.asarray(encode_vision_host(OmniVisionEncoder(cfg), params,
                                        patches, (1, 6, 8)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_thinker_text_mrope_matches_transformers():
    """Decoder with mrope_section 3-D RoPE vs HF Qwen2_5OmniThinkerTextModel
    on divergent t/h/w position streams (modeling_qwen2_5_omni.py:1503)."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniTextConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniThinkerTextModel

    from spider_tpu.models.convert import convert_llama_state_dict
    from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    hcfg = Qwen2_5OmniTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=1e6,
        rope_scaling={"mrope_section": [2, 3, 3], "rope_type": "default",
                      "type": "default"})
    hcfg._attn_implementation = "eager"
    tm = Qwen2_5OmniThinkerTextModel(hcfg).eval()

    T = 12
    ids = np.random.RandomState(0).randint(0, 128, (1, T))
    pos = np.stack([np.arange(T), np.arange(T) % 5,
                    np.arange(T) % 3])[:, None, :]
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 position_ids=torch.tensor(pos)).last_hidden_state.numpy()

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, rms_norm_eps=1e-6,
                      rope_theta=1e6, attention_bias=True,
                      mrope_section=(2, 3, 3), dtype=jnp.float32)
    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()}
    sd["lm_head.weight"] = np.zeros((128, 64), np.float32)
    params = convert_llama_state_dict(sd, cfg)
    _, hs, _ = LlamaForCausalLM(cfg).apply(
        params, input_ids=jnp.asarray(ids), positions=jnp.asarray(pos),
        output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(hs[-1])[0], ref[0], atol=2e-5)


def test_mrope_positions_match_get_rope_index():
    """build_mrope_positions (segment port) vs the HF get_rope_index scan
    for a text + image + text sequence (modeling_qwen2_5_omni.py:189).
    HF's vision_start/vision_end tokens map to the neighboring text
    segments (same contiguous numbering)."""
    torch = _torch()
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniTextConfig, Qwen2_5OmniThinkerConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniThinkerForConditionalGeneration

    tcfg = Qwen2_5OmniTextConfig(
        vocab_size=200, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=_tiny_hf_audio_cfg().to_dict(),
        vision_config=_tiny_hf_vision_cfg().to_dict(),
        text_config=tcfg.to_dict(),
        audio_token_index=190, image_token_index=191, video_token_index=192,
        audio_start_token_id=193, audio_end_token_id=194)
    cfg.vision_start_token_id = 195
    cfg.vision_end_token_id = 196
    cfg._attn_implementation = "eager"
    tm = Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()

    # [text text text vision_start IMG*4 vision_end text text] grid (1,4,4)
    ids = [5, 6, 7, 195] + [191] * 4 + [196, 8, 9]
    with torch.no_grad():
        ref_pos, _ = tm.get_rope_index(
            input_ids=torch.tensor([ids]),
            image_grid_thw=torch.tensor([[1, 4, 4]]))
    ref = ref_pos.numpy()[:, 0, :]

    got = build_mrope_positions([
        MMSegment("text", 4),                 # 3 text + vision_start
        MMSegment("image", grid_thw=(1, 4, 4)),
        MMSegment("text", 3),                 # vision_end + 2 text
    ], spatial_merge_size=2)
    np.testing.assert_array_equal(got, ref)


def test_thinker_multimodal_forward_matches_transformers():
    """End-to-end thinker parity: HF forward with pixel_values spliced at
    image tokens vs our manual splice + m-RoPE positions + converted
    decoder — catches embed-splice ordering and position-numbering bugs
    (modeling_qwen2_5_omni.py:1666)."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniTextConfig, Qwen2_5OmniThinkerConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniThinkerForConditionalGeneration

    from spider_tpu.models.convert import convert_omni_thinker
    from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from spider_tpu.models.qwen_omni import (OmniVisionConfig,
                                             OmniVisionEncoder,
                                             OmniAudioConfig,
                                             OmniAudioEncoder,
                                             encode_vision_host)

    tcfg = Qwen2_5OmniTextConfig(
        vocab_size=200, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1e6,
        rope_scaling={"mrope_section": [2, 2, 2], "rope_type": "default",
                      "type": "default"})
    vcfg_hf = _tiny_hf_vision_cfg()
    vcfg_hf.out_hidden_size = 48
    acfg_hf = _tiny_hf_audio_cfg()
    acfg_hf.output_dim = 48
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=acfg_hf.to_dict(), vision_config=vcfg_hf.to_dict(),
        text_config=tcfg.to_dict(),
        audio_token_index=190, image_token_index=191, video_token_index=192,
        audio_start_token_id=193, audio_end_token_id=194)
    cfg.vision_start_token_id = 195
    cfg.vision_end_token_id = 196
    cfg._attn_implementation = "eager"
    tm = Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()

    # one 16x16 image -> grid (1,4,4) -> 4 merged tokens
    S = 16
    patches = np.random.RandomState(1).randn(S, 3 * 2 * 4 * 4).astype(
        np.float32)
    ids = [5, 6, 195] + [191] * 4 + [196, 7, 8]
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor([[1, 4, 4]])).logits.numpy()

    acfg = OmniAudioConfig(num_mel_bins=16, d_model=32, num_layers=2,
                           num_heads=4, ffn_dim=64, n_window=8,
                           max_positions=64, output_dim=48)
    vcfg = OmniVisionConfig(depth=2, hidden_size=32, intermediate_size=64,
                            num_heads=4, patch_size=4, window_size=16,
                            out_hidden_size=48, fullatt_block_indexes=(1,))
    lcfg = LlamaConfig(vocab_size=200, hidden_size=48, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, rms_norm_eps=1e-6,
                       rope_theta=1e6, attention_bias=True,
                       mrope_section=(2, 2, 2), dtype=jnp.float32)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    aparams, vparams, lparams = convert_omni_thinker(sd, acfg, vcfg, lcfg)

    llm = LlamaForCausalLM(lcfg)
    img_emb = encode_vision_host(OmniVisionEncoder(vcfg), vparams, patches,
                                 (1, 4, 4))
    text_emb = lambda t: llm.apply(lparams, jnp.asarray([t], jnp.int32),
                                   method=llm.embed)[0]
    embeds = jnp.concatenate(
        [text_emb(ids[:3]), img_emb, text_emb(ids[7:])], axis=0)[None]
    pos = build_mrope_positions([
        MMSegment("text", 3), MMSegment("image", grid_thw=(1, 4, 4)),
        MMSegment("text", 3)], spatial_merge_size=2)[:, None, :]
    logits, _, _ = llm.apply(lparams, inputs_embeds=embeds,
                             positions=jnp.asarray(pos))
    # atol: fp32 accumulation-order noise (oneDNN vs XLA) amplified through
    # tower -> decoder -> lm_head; logits scale is O(0.1)
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0], atol=5e-3)
