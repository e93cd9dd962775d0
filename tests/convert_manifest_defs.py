"""Converter key-manifest registry (VERDICT r2 item 8).

Every weight converter's *source-key contract* is recorded as a fixture:
the exact state-dict key list of the real checkpoint family. Key names
depend only on DEPTH (layer/block counts), never width, so each family's
manifest config keeps the real checkpoint's depths while shrinking widths
to make generation cheap. The fixture files under
tests/fixtures/convert_keys/ are produced by tools/gen_converter_manifests
from the same inverse-emitters the roundtrip tests use, and
tools/verify_checkpoints.py diffs a real mounted checkpoint against them
(then runs the converter) in one command — the DINO key-audit pattern
(docs/grounding_dino_key_audit.md) extended to every family.
"""

import dataclasses as dc

import numpy as np


def _llama_cfg():
    from spider_tpu.models import llama as L

    return dc.replace(L.llama3_8b(), hidden_size=64, intermediate_size=128,
                      head_dim=2)


def _make_llama(cfg):
    from test_convert import _fake_llama_sd

    return _fake_llama_sd(cfg, np.random.default_rng(0))


def _clip_cfg(full):
    return dc.replace(full, hidden_size=16, intermediate_size=32,
                      num_attention_heads=2,
                      projection_dim=8 if full.projection_dim else None)


def _make_clip(cfg):
    from test_convert import make_clip_sd

    return make_clip_sd(cfg)


def _bert_cfg():
    from spider_tpu.models.bert import bert_base

    return dc.replace(bert_base(), hidden_size=16, intermediate_size=32,
                      num_attention_heads=2)


def _make_bert(cfg):
    from test_convert import make_bert_sd

    return make_bert_sd(cfg)


def _vae_cfg(full):
    # preserve the channel-CHANGE pattern (it decides conv_shortcut keys)
    scaled = tuple(c // 16 for c in full.block_out_channels)
    return dc.replace(full, block_out_channels=scaled, norm_num_groups=4)


def _unet2d_cfg(full):
    scaled = tuple(c // 16 for c in full.block_out_channels)
    return dc.replace(full, block_out_channels=scaled, norm_num_groups=4,
                      cross_attention_dim=16,
                      num_attention_heads=(2,) * len(scaled))


def _unet3d_cfg():
    from spider_tpu.models.unet3d import unet3d_zeroscope

    full = unet3d_zeroscope()
    scaled = tuple(c // 16 for c in full.block_out_channels)
    return dc.replace(full, block_out_channels=scaled, norm_num_groups=4,
                      cross_attention_dim=16,
                      num_attention_heads=(2,) * len(scaled))


def _sam_cfg():
    from spider_tpu.models.sam import sam_vit_h

    return dc.replace(sam_vit_h(), img_size=128, encoder_width=32,
                      encoder_heads=16, prompt_embed_dim=16, mask_in_chans=4,
                      window_size=2)


def _imagebind_cfg():
    from spider_tpu.models.imagebind import (ImageBindConfig, TrunkConfig,
                                             imagebind_huge)

    full = imagebind_huge()
    return dc.replace(
        full, embed_dim=16,
        vision=TrunkConfig(32, full.vision.layers, 16, full.vision.pre_ln),
        audio=TrunkConfig(32, full.audio.layers, 16, full.audio.pre_ln),
        image_size=28, patch_size=14, audio_mel_bins=16, audio_target_len=20)


def _swin_t_cfg():
    from spider_tpu.models.swin import swin_tiny

    return dc.replace(swin_tiny(), embed_dim=12)


def _hifigan_cfg():
    from spider_tpu.models.vocoder import hifigan_audioldm

    return dc.replace(hifigan_audioldm(), model_in_dim=8,
                      upsample_initial_channel=64)


def _clap_cfg():
    from spider_tpu.models.clip_text import ClapTextConfig

    return dc.replace(ClapTextConfig(), hidden_size=16, intermediate_size=32,
                      num_attention_heads=2, projection_dim=8)


def _dino_cfg():
    from spider_tpu.models.dino import GroundingDINOConfig

    return GroundingDINOConfig(
        hidden_dim=32, num_heads=4, ffn_dim=64, num_queries=900,
        max_text_len=64, backbone=_swin_t_cfg(), bert=_bert_cfg())


def _photomaker_cfg():
    from spider_tpu.models.photomaker import photomaker_v1

    # keep the real depth (24 layers — key names depend on it), shrink width
    return dc.replace(photomaker_v1(), hidden_size=16, intermediate_size=32,
                      num_attention_heads=2, image_size=28, patch_size=14,
                      projection_dim=8, projection_dim_2=8, embed_dim=16)


def _make_photomaker(cfg):
    from test_convert_diffusion import make_photomaker_sd

    return make_photomaker_sd(cfg)[0]


# --- Qwen2.5-Omni families (VERDICT r3 item 4) -----------------------------
# Emitters build the LOCAL transformers Qwen2.5-Omni modules at the REAL
# checkpoint depths (key names depend on depth, never width) with tiny
# widths, and record their exact state_dict key lists — the same source
# the parity tests (tests/test_qwen_omni.py etc.) convert from. Reference
# load site: /root/reference/qwen2.5omni_spider_web.py:368-383.

def _omni_audio_cfg():
    from spider_tpu.models.qwen_omni import OmniAudioConfig

    # real depth: 32 encoder layers (Qwen2_5OmniAudioEncoderConfig default)
    return OmniAudioConfig(num_mel_bins=16, d_model=32, num_layers=32,
                           num_heads=4, ffn_dim=64, n_window=8,
                           max_positions=64, output_dim=48)


def _make_omni_audio(cfg):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniAudioEncoderConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniAudioEncoder

    h = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=cfg.num_mel_bins, encoder_layers=cfg.num_layers,
        encoder_attention_heads=cfg.num_heads, encoder_ffn_dim=cfg.ffn_dim,
        d_model=cfg.d_model, max_source_positions=cfg.max_positions,
        n_window=cfg.n_window, output_dim=cfg.output_dim)
    h._attn_implementation = "eager"
    tm = Qwen2_5OmniAudioEncoder(h)
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _omni_vision_cfg():
    from spider_tpu.models.qwen_omni import OmniVisionConfig

    # real depth: 32 blocks, full-attention at (7, 15, 23, 31)
    return OmniVisionConfig(depth=32, hidden_size=32, intermediate_size=64,
                            num_heads=4, patch_size=4, window_size=16,
                            out_hidden_size=48,
                            fullatt_block_indexes=(7, 15, 23, 31))


def _make_omni_vision(cfg):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniVisionEncoderConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniVisionEncoder

    h = Qwen2_5OmniVisionEncoderConfig(
        depth=cfg.depth, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_heads=cfg.num_heads,
        in_channels=cfg.in_channels, patch_size=cfg.patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        temporal_patch_size=cfg.temporal_patch_size,
        window_size=cfg.window_size, out_hidden_size=cfg.out_hidden_size,
        fullatt_block_indexes=list(cfg.fullatt_block_indexes))
    h._attn_implementation = "eager"
    tm = Qwen2_5OmniVisionEncoder(h)
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _omni_talker_cfg():
    from spider_tpu.models.omni_talker import talker_tiny

    # real depth: 28 decoder layers (Qwen2_5OmniTalkerConfig default)
    return dc.replace(talker_tiny(), num_hidden_layers=28)


def _make_omni_talker(cfg):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniTalkerConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniTalkerForConditionalGeneration

    h = Qwen2_5OmniTalkerConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        embedding_size=cfg.embedding_size, max_position_embeddings=256,
        rope_theta=cfg.rope_theta,
        rope_scaling={"mrope_section": list(cfg.mrope_section or (2, 1, 1)),
                      "rope_type": "default", "type": "default"})
    h._attn_implementation = "eager"
    tm = Qwen2_5OmniTalkerForConditionalGeneration(h)
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _omni_dit_cfg():
    from spider_tpu.models.omni_token2wav import dit_tiny

    # real depths: 22 AdaLN blocks, 5-stage ECAPA, res2net scale 2
    return dc.replace(dit_tiny(), num_hidden_layers=22,
                      look_ahead_layers=(10,), look_backward_layers=(0, 20))


def _make_omni_dit(cfg):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniDiTConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniToken2WavDiTModel

    h = Qwen2_5OmniDiTConfig(
        mel_dim=cfg.mel_dim, num_embeds=cfg.num_embeds, emb_dim=cfg.emb_dim,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, head_dim=cfg.head_dim,
        ff_mult=cfg.ff_mult, block_size=cfg.block_size,
        look_ahead_layers=list(cfg.look_ahead_layers),
        look_backward_layers=list(cfg.look_backward_layers),
        repeats=cfg.repeats, enc_dim=cfg.enc_dim,
        enc_emb_dim=cfg.enc_emb_dim, enc_channels=list(cfg.enc_channels),
        enc_kernel_sizes=list(cfg.enc_kernel_sizes),
        enc_dilations=list(cfg.enc_dilations),
        enc_attention_channels=cfg.enc_attention_channels,
        enc_res2net_scale=cfg.enc_res2net_scale,
        enc_se_channels=cfg.enc_se_channels, dropout=0.0)
    h._attn_implementation = "sdpa"
    tm = Qwen2_5OmniToken2WavDiTModel(h)
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _omni_bigvgan_cfg():
    from spider_tpu.models.omni_token2wav import BigVGANConfig

    # real structure: 6 upsample stages x 3 resblock kernels; tiny initial
    # channel divisible by 2^6 so every stage halves cleanly
    return BigVGANConfig(mel_dim=8, upsample_initial_channel=64,
                         resblock_kernel_sizes=(3, 7, 11),
                         resblock_dilation_sizes=((1, 3, 5),) * 3,
                         upsample_rates=(5, 3, 2, 2, 2, 2),
                         upsample_kernel_sizes=(11, 7, 4, 4, 4, 4))


def _make_omni_bigvgan(cfg):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniBigVGANConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniToken2WavBigVGANModel

    h = Qwen2_5OmniBigVGANConfig(
        mel_dim=cfg.mel_dim,
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in
                                 cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes))
    h._attn_implementation = "sdpa"
    tm = Qwen2_5OmniToken2WavBigVGANModel(h)
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _wrap3(make):
    def f(cfg):
        return make(cfg)[0]
    return f


def _make_swin(cfg):
    from test_convert_diffusion import make_swin_sd

    # swin-T operating point: window 7, patch 4 -> 224-px canvas
    return make_swin_sd(cfg, img=224)[0]


def families():
    """family -> (manifest_cfg, make_sd(cfg)->sd, convert(sd, cfg))."""
    from test_convert_diffusion import (make_clap_sd, make_grounding_dino_sd,
                                        make_hifigan_sd, make_imagebind_sd,
                                        make_sam_sd, make_unet2d_sd,
                                        make_unet3d_sd, make_vae_sd)

    from spider_tpu.models import convert as C
    from spider_tpu.models.clip_text import (clip_vit_h14, clip_vit_l14,
                                             open_clip_bigg)
    from spider_tpu.models.unet2d import unet_audioldm, unet_sd15, unet_sdxl
    from spider_tpu.models.vae import vae_audioldm, vae_sd, vae_sdxl

    return {
        "llama3_8b": (_llama_cfg(), _make_llama, C.convert_llama_state_dict),
        "clip_vit_l14": (_clip_cfg(clip_vit_l14()), _make_clip,
                         C.convert_clip_text_state_dict),
        "clip_vit_h14": (_clip_cfg(clip_vit_h14()), _make_clip,
                         C.convert_clip_text_state_dict),
        "clip_bigg": (_clip_cfg(open_clip_bigg()), _make_clip,
                      C.convert_clip_text_state_dict),
        "bert_base": (_bert_cfg(), _make_bert, C.convert_bert_state_dict),
        "vae_sd": (_vae_cfg(vae_sd()), _wrap3(make_vae_sd),
                   C.convert_vae_state_dict),
        "vae_audioldm": (_vae_cfg(vae_audioldm()), _wrap3(make_vae_sd),
                         C.convert_vae_state_dict),
        "unet_sd15": (_unet2d_cfg(unet_sd15()), _wrap3(make_unet2d_sd),
                      C.convert_unet2d_state_dict),
        "unet_sdxl": (_unet2d_cfg(unet_sdxl()), _wrap3(make_unet2d_sd),
                      C.convert_unet2d_state_dict),
        "unet_audioldm": (_unet2d_cfg(unet_audioldm()),
                          _wrap3(make_unet2d_sd),
                          C.convert_unet2d_state_dict),
        "unet3d_zeroscope": (_unet3d_cfg(), _wrap3(make_unet3d_sd),
                             C.convert_unet3d_state_dict),
        "sam_vit_h": (_sam_cfg(), _wrap3(make_sam_sd),
                      C.convert_sam_state_dict),
        "imagebind_huge": (_imagebind_cfg(), _wrap3(make_imagebind_sd),
                           C.convert_imagebind_state_dict),
        "swin_t": (_swin_t_cfg(), _make_swin, C.convert_swin_state_dict),
        "hifigan_audioldm": (_hifigan_cfg(), _wrap3(make_hifigan_sd),
                             C.convert_hifigan_state_dict),
        "clap_text": (_clap_cfg(), _wrap3(make_clap_sd),
                      C.convert_clap_text_state_dict),
        "grounding_dino_swin_t": (_dino_cfg(),
                                  _wrap3(make_grounding_dino_sd),
                                  C.convert_grounding_dino_state_dict),
        "photomaker_v1": (_photomaker_cfg(), _make_photomaker,
                          C.convert_photomaker_state_dict),
        # Qwen2.5-Omni (bare-module key contract, prefix=""; the full-Omni
        # checkpoint prefixes are stripped by tools/verify_checkpoints.py)
        "omni_audio_tower": (
            _omni_audio_cfg(), _make_omni_audio,
            lambda sd, cfg: C.convert_omni_audio_tower(sd, cfg, prefix="")),
        "omni_vision_tower": (
            _omni_vision_cfg(), _make_omni_vision,
            lambda sd, cfg: C.convert_omni_vision_tower(sd, cfg, prefix="")),
        "omni_talker": (_omni_talker_cfg(), _make_omni_talker,
                        C.convert_omni_talker),
        "omni_dit": (_omni_dit_cfg(), _make_omni_dit, C.convert_omni_dit),
        "omni_bigvgan": (_omni_bigvgan_cfg(), _make_omni_bigvgan,
                         C.convert_omni_bigvgan),
    }
