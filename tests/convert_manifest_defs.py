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
    }
