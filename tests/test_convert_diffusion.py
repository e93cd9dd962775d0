"""Converter tests for diffusers-style VAE/UNet state dicts: synthesize a
torch-layout state dict by INVERTING the converter's name/transpose mapping
from our randomly-initialized params, then assert the round trip reproduces
the exact param tree (structure + values)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models.convert import (convert_unet2d_state_dict,
                                       convert_vae_state_dict)
from spider_tpu.models.unet2d import UNet2DConditionModel, unet_tiny
from spider_tpu.models.vae import AutoencoderKL, vae_tiny


def _inv_conv(kernel):  # HWIO -> OIHW
    return np.asarray(kernel).transpose(3, 2, 0, 1)


def _emit_module(sd, torch_key, mod):
    """Write a flax module's params into sd under diffusers naming."""
    if "kernel" in mod and np.ndim(mod["kernel"]) == 4:
        sd[torch_key + ".weight"] = _inv_conv(mod["kernel"])
        if "bias" in mod:
            sd[torch_key + ".bias"] = np.asarray(mod["bias"])
    elif "kernel" in mod:
        sd[torch_key + ".weight"] = np.asarray(mod["kernel"]).T
        if "bias" in mod:
            sd[torch_key + ".bias"] = np.asarray(mod["bias"])
    elif "scale" in mod:
        sd[torch_key + ".weight"] = np.asarray(mod["scale"])
        sd[torch_key + ".bias"] = np.asarray(mod["bias"])
    else:
        raise KeyError(list(mod))


def _emit_resnet(sd, torch_pre, p, with_time=False):
    _emit_module(sd, torch_pre + ".norm1", p["norm1"])
    _emit_module(sd, torch_pre + ".conv1", p["conv1"])
    _emit_module(sd, torch_pre + ".norm2", p["norm2"])
    _emit_module(sd, torch_pre + ".conv2", p["conv2"])
    if "conv_shortcut" in p:
        _emit_module(sd, torch_pre + ".conv_shortcut", p["conv_shortcut"])
    if with_time:
        _emit_module(sd, torch_pre + ".time_emb_proj", p["time_emb_proj"])


def _emit_vae_attn(sd, torch_pre, p):
    _emit_module(sd, torch_pre + ".group_norm", p["norm"])
    _emit_module(sd, torch_pre + ".to_q", p["q"])
    _emit_module(sd, torch_pre + ".to_k", p["k"])
    _emit_module(sd, torch_pre + ".to_v", p["v"])
    _emit_module(sd, torch_pre + ".to_out.0", p["proj_out"])


def make_vae_sd(cfg):
    """Inverse-emit a diffusers AutoencoderKL state dict from a random
    init; key names depend only on depth, so at a depth-true config the
    key set IS the real checkpoint's (manifest fixtures)."""
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    enc = params["params"]["encoder"]
    dec = params["params"]["decoder"]
    n = len(cfg.block_out_channels)

    sd = {}
    _emit_module(sd, "encoder.conv_in", enc["conv_in"])
    _emit_module(sd, "encoder.conv_norm_out", enc["norm_out"])
    _emit_module(sd, "encoder.conv_out", enc["conv_out"])
    _emit_module(sd, "quant_conv", enc["quant_conv"])
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _emit_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                         enc[f"down_{i}_res_{j}"])
        if i < n - 1:
            _emit_module(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                         enc[f"down_{i}_downsample"])
    _emit_resnet(sd, "encoder.mid_block.resnets.0", enc["mid_res_0"])
    _emit_resnet(sd, "encoder.mid_block.resnets.1", enc["mid_res_1"])
    _emit_vae_attn(sd, "encoder.mid_block.attentions.0", enc["mid_attn"])

    _emit_module(sd, "decoder.conv_in", dec["conv_in"])
    _emit_module(sd, "decoder.conv_norm_out", dec["norm_out"])
    _emit_module(sd, "decoder.conv_out", dec["conv_out"])
    _emit_module(sd, "post_quant_conv", dec["post_quant_conv"])
    _emit_resnet(sd, "decoder.mid_block.resnets.0", dec["mid_res_0"])
    _emit_resnet(sd, "decoder.mid_block.resnets.1", dec["mid_res_1"])
    _emit_vae_attn(sd, "decoder.mid_block.attentions.0", dec["mid_attn"])
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _emit_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                         dec[f"up_{i}_res_{j}"])
        if i < n - 1:
            _emit_module(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                         dec[f"up_{i}_upsample"])

    return sd, model, params


@pytest.mark.slow
def test_vae_converter_roundtrip():
    cfg = vae_tiny()
    sd, model, params = make_vae_sd(cfg)
    converted = convert_vae_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def _emit_tfm_block(sd, pre, p):
    for n in ("norm1", "norm2", "norm3"):
        _emit_module(sd, f"{pre}.{n}", p[n])
    for a in ("attn1", "attn2"):
        _emit_module(sd, f"{pre}.{a}.to_q", p[a]["to_q"])
        _emit_module(sd, f"{pre}.{a}.to_k", p[a]["to_k"])
        _emit_module(sd, f"{pre}.{a}.to_v", p[a]["to_v"])
        _emit_module(sd, f"{pre}.{a}.to_out.0", p[a]["to_out"])
    _emit_module(sd, f"{pre}.ff.net.0.proj", p["ff"]["proj_in"])
    _emit_module(sd, f"{pre}.ff.net.2", p["ff"]["proj_out"])


def _emit_unet_attn(sd, pre, p, depth):
    _emit_module(sd, pre + ".norm", p["norm"])
    _emit_module(sd, pre + ".proj_in", p["proj_in"])
    _emit_module(sd, pre + ".proj_out", p["proj_out"])
    for k in range(depth):
        _emit_tfm_block(sd, f"{pre}.transformer_blocks.{k}", p[f"block_{k}"])


def make_unet2d_sd(cfg):
    model = UNet2DConditionModel(cfg)
    added = None
    if cfg.addition_embed_type == "text_time":       # SDXL
        tid_dim = 6 * cfg.addition_time_embed_dim
        added = {"text_embeds": jnp.zeros(
                     (1, cfg.projection_class_embeddings_input_dim - tid_dim)),
                 "time_ids": jnp.zeros((1, 6))}
    elif cfg.addition_embed_type == "class_embed":   # AudioLDM
        added = {"class_embeds": jnp.zeros((1, cfg.cross_attention_dim))}
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 8, cfg.in_channels)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 7, cfg.cross_attention_dim)),
                           added_cond=added)
    params = {"params": variables["params"]}  # drop the sown 'story' capture
    p = params["params"]
    n = len(cfg.block_out_channels)
    sd = {}
    _emit_module(sd, "conv_in", p["conv_in"])
    _emit_module(sd, "time_embedding.linear_1", p["time_embed_1"])
    _emit_module(sd, "time_embedding.linear_2", p["time_embed_2"])
    _emit_module(sd, "conv_norm_out", p["norm_out"])
    _emit_module(sd, "conv_out", p["conv_out"])
    if cfg.addition_embed_type == "text_time":         # SDXL
        _emit_module(sd, "add_embedding.linear_1", p["add_embed_1"])
        _emit_module(sd, "add_embedding.linear_2", p["add_embed_2"])
    elif cfg.addition_embed_type == "class_embed":     # AudioLDM
        _emit_module(sd, "class_embedding.linear_1", p["class_embed_1"])
        _emit_module(sd, "class_embedding.linear_2", p["class_embed_2"])
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _emit_resnet(sd, f"down_blocks.{i}.resnets.{j}",
                         p[f"down_{i}_res_{j}"], with_time=True)
            if cfg.cross_attn_blocks[i] and cfg.transformer_layers_per_block[i]:
                _emit_unet_attn(sd, f"down_blocks.{i}.attentions.{j}",
                                p[f"down_{i}_attn_{j}"],
                                cfg.transformer_layers_per_block[i])
        if i < n - 1:
            _emit_module(sd, f"down_blocks.{i}.downsamplers.0.conv",
                         p[f"down_{i}_downsample"])
    _emit_resnet(sd, "mid_block.resnets.0", p["mid_res_0"], with_time=True)
    _emit_resnet(sd, "mid_block.resnets.1", p["mid_res_1"], with_time=True)
    if "mid_attn" in p:
        _emit_unet_attn(sd, "mid_block.attentions.0", p["mid_attn"],
                        max(cfg.transformer_layers_per_block[-1], 1))
    rev_attn = list(reversed(cfg.cross_attn_blocks))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _emit_resnet(sd, f"up_blocks.{i}.resnets.{j}",
                         p[f"up_{i}_res_{j}"], with_time=True)
            if rev_attn[i] and rev_depth[i]:
                _emit_unet_attn(sd, f"up_blocks.{i}.attentions.{j}",
                                p[f"up_{i}_attn_{j}"], rev_depth[i])
        if i < n - 1:
            _emit_module(sd, f"up_blocks.{i}.upsamplers.0.conv",
                         p[f"up_{i}_upsample"])

    return sd, model, params


@pytest.mark.slow
def test_unet2d_converter_roundtrip():
    cfg = unet_tiny()
    sd, model, params = make_unet2d_sd(cfg)
    converted = convert_unet2d_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def make_sam_sd(cfg):
    from spider_tpu.models.sam import Sam

    model = Sam(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, cfg.img_size, cfg.img_size)),
                        boxes=jnp.zeros((1, 1, 4)))
    p = params["params"]
    sd = {}
    enc = p["image_encoder"]
    _emit_module(sd, "image_encoder.patch_embed.proj", enc["patch_embed"])
    sd["image_encoder.pos_embed"] = np.asarray(enc["pos_embed"])
    sd["image_encoder.neck.0.weight"] = _inv_conv(enc["neck_conv1"]["kernel"])
    _emit_module(sd, "image_encoder.neck.1", enc["neck_ln1"])
    sd["image_encoder.neck.2.weight"] = _inv_conv(enc["neck_conv2"]["kernel"])
    _emit_module(sd, "image_encoder.neck.3", enc["neck_ln2"])
    for i in range(cfg.encoder_layers):
        b = f"image_encoder.blocks.{i}."
        blk = enc[f"block_{i}"]
        _emit_module(sd, b + "norm1", blk["ln1"])
        _emit_module(sd, b + "norm2", blk["ln2"])
        qw = np.asarray(blk["q"]["kernel"]).T
        kw = np.asarray(blk["k"]["kernel"]).T
        vw = np.asarray(blk["v"]["kernel"]).T
        sd[b + "attn.qkv.weight"] = np.concatenate([qw, kw, vw], axis=0)
        sd[b + "attn.qkv.bias"] = np.concatenate(
            [np.asarray(blk[x]["bias"]) for x in ("q", "k", "v")], axis=0)
        _emit_module(sd, b + "attn.proj", blk["proj"])
        _emit_module(sd, b + "mlp.lin1", blk["fc1"])
        _emit_module(sd, b + "mlp.lin2", blk["fc2"])
        sd[b + "attn.rel_pos_h"] = np.asarray(blk["rel_pos_h"])
        sd[b + "attn.rel_pos_w"] = np.asarray(blk["rel_pos_w"])
    pe = p["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(pe["pe_gaussian"])
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            np.asarray(pe["point_embeddings"][i:i + 1])
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(pe["not_a_point"])
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(pe["no_mask_embed"])
    md = p["mask_decoder"]
    sd["mask_decoder.iou_token.weight"] = np.asarray(md["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(md["mask_tokens"])

    def inv_convT(kern):  # flax [kh,kw,in,out] -> torch [in,out,kh,kw]
        return np.asarray(kern).transpose(2, 3, 0, 1)

    sd["mask_decoder.output_upscaling.0.weight"] = inv_convT(md["upscale_1"]["kernel"])
    sd["mask_decoder.output_upscaling.0.bias"] = np.asarray(md["upscale_1"]["bias"])
    _emit_module(sd, "mask_decoder.output_upscaling.1", md["upscale_ln"])
    sd["mask_decoder.output_upscaling.3.weight"] = inv_convT(md["upscale_2"]["kernel"])
    sd["mask_decoder.output_upscaling.3.bias"] = np.asarray(md["upscale_2"]["bias"])
    for nm, ours in (("q_proj", "final_q"), ("k_proj", "final_k"),
                     ("v_proj", "final_v"), ("out_proj", "final_out")):
        _emit_module(sd, "mask_decoder.transformer.final_attn_token_to_image." + nm,
                     md[ours])
    _emit_module(sd, "mask_decoder.transformer.norm_final_attn", md["final_ln"])
    for i in range(cfg.decoder_depth):
        b = f"mask_decoder.transformer.layers.{i}."
        blk = md[f"block_{i}"]
        for tname, oname in (("self_attn", "self"),
                             ("cross_attn_token_to_image", "cross_qk"),
                             ("cross_attn_image_to_token", "cross_kq")):
            for pp in ("q", "k", "v", "out"):
                _emit_module(sd, b + f"{tname}.{pp}_proj", blk[f"{oname}_{pp}"])
        for j in range(1, 5):
            _emit_module(sd, b + f"norm{j}", blk[f"ln{j}"])
        _emit_module(sd, b + "mlp.lin1", blk["fc1"])
        _emit_module(sd, b + "mlp.lin2", blk["fc2"])
    for i in range(cfg.num_multimask_outputs + 1):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
        _emit_module(sd, h + "0", md[f"hyper_{i}_fc0"])
        _emit_module(sd, h + "1", md[f"hyper_{i}_fc1"])
        _emit_module(sd, h + "2", md[f"hyper_{i}_out"])
    ih = "mask_decoder.iou_prediction_head.layers."
    _emit_module(sd, ih + "0", md["iou_fc0"])
    _emit_module(sd, ih + "1", md["iou_fc1"])
    _emit_module(sd, ih + "2", md["iou_out"])

    return sd, model, params


@pytest.mark.slow
def test_sam_converter_roundtrip():
    from spider_tpu.models.convert import convert_sam_state_dict
    from spider_tpu.models.sam import sam_tiny

    cfg = sam_tiny()
    sd, model, params = make_sam_sd(cfg)
    converted = convert_sam_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def make_imagebind_sd(cfg):
    from spider_tpu.models.imagebind import ImageBindEncoder

    model = ImageBindEncoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        {"vision": jnp.zeros((1, 3, 2, cfg.image_size, cfg.image_size)),
         "audio": jnp.zeros((1, 1, cfg.audio_mel_bins, cfg.audio_target_len))})
    p = params["params"]
    sd = {}
    sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"] = \
        np.asarray(p["vision_patch"]["kernel"]).transpose(4, 3, 0, 1, 2)
    sd["modality_preprocessors.audio.rgbt_stem.proj.weight"] = \
        _inv_conv(p["audio_patch"]["kernel"])
    for m, trunk_cfg in (("vision", cfg.vision), ("audio", cfg.audio)):
        t = p[f"{m}_trunk"]
        sd[f"modality_preprocessors.{m}.cls_token"] = \
            np.asarray(t["cls_token"]).reshape(1, 1, -1)
        sd[f"modality_preprocessors.{m}.pos_embedding_helper.pos_embed"] = \
            np.asarray(t["pos_embed"])
        _emit_module(sd, f"modality_trunks.{m}.pre_transformer_layer.0",
                     t["pre_ln"])
        for i in range(trunk_cfg.layers):
            b = f"modality_trunks.{m}.blocks.{i}."
            blk = t[f"block_{i}"]
            _emit_module(sd, b + "norm_1", blk["ln1"])
            _emit_module(sd, b + "norm_2", blk["ln2"])
            sd[b + "attn.in_proj_weight"] = np.concatenate(
                [np.asarray(blk[x]["kernel"]).T for x in "qkv"], axis=0)
            sd[b + "attn.in_proj_bias"] = np.concatenate(
                [np.asarray(blk[x]["bias"]) for x in "qkv"], axis=0)
            _emit_module(sd, b + "attn.out_proj", blk["proj"])
            _emit_module(sd, b + "mlp.fc1", blk["fc1"])
            _emit_module(sd, b + "mlp.fc2", blk["fc2"])
        _emit_module(sd, f"modality_heads.{m}.0", p[f"{m}_head_ln"])
        sd[f"modality_heads.{m}.2.weight"] = \
            np.asarray(p[f"{m}_head"]["kernel"]).T

    return sd, model, params


@pytest.mark.slow  # 12s; manifest + other roundtrips stay fast
def test_imagebind_converter_roundtrip():
    from spider_tpu.models.convert import convert_imagebind_state_dict
    from spider_tpu.models.imagebind import imagebind_tiny

    cfg = imagebind_tiny()
    sd, model, params = make_imagebind_sd(cfg)
    converted = convert_imagebind_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def make_swin_sd(cfg, img=32):
    from spider_tpu.models.swin import SwinTransformer

    model = SwinTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, img, img)))
    p = params["params"]
    sd = {}
    _emit_module(sd, "backbone.patch_embed.projection", p["patch_embed"])
    _emit_module(sd, "backbone.patch_embed.norm", p["patch_norm"])
    for s, depth in enumerate(cfg.depths):
        for b in range(depth):
            base = f"backbone.stages.{s}.blocks.{b}."
            blk = p[f"stage{s}_block{b}"]
            _emit_module(sd, base + "norm1", blk["norm1"])
            _emit_module(sd, base + "norm2", blk["norm2"])
            sd[base + "attn.w_msa.qkv.weight"] = np.concatenate(
                [np.asarray(blk[x]["kernel"]).T for x in "qkv"], axis=0)
            sd[base + "attn.w_msa.qkv.bias"] = np.concatenate(
                [np.asarray(blk[x]["bias"]) for x in "qkv"], axis=0)
            _emit_module(sd, base + "attn.w_msa.proj", blk["proj"])
            sd[base + "attn.w_msa.relative_position_bias_table"] = \
                np.asarray(blk["rel_pos_bias"])
            _emit_module(sd, base + "ffn.layers.0.0", blk["fc1"])
            _emit_module(sd, base + "ffn.layers.1", blk["fc2"])
        if s < len(cfg.depths) - 1:
            _emit_module(sd, f"backbone.stages.{s}.downsample.norm",
                         p[f"merge{s}"]["norm"])
            sd[f"backbone.stages.{s}.downsample.reduction.weight"] = \
                np.asarray(p[f"merge{s}"]["reduction"]["kernel"]).T
        if s in cfg.out_indices:
            _emit_module(sd, f"backbone.norm{s}", p[f"out_norm{s}"])

    return sd, model, params


@pytest.mark.slow
def test_swin_converter_roundtrip():
    from spider_tpu.models.convert import convert_swin_state_dict
    from spider_tpu.models.swin import swin_test

    cfg = swin_test()
    sd, model, params = make_swin_sd(cfg)
    converted = convert_swin_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def make_hifigan_sd(cfg):
    from spider_tpu.models.vocoder import HifiGan

    model = HifiGan(cfg)
    mel = jnp.zeros((1, 10, cfg.model_in_dim))
    params = model.init(jax.random.PRNGKey(0), mel)
    p = params["params"]
    sd = {}

    def inv1d(kern):  # flax [k,in,out] -> torch conv1d [out,in,k]
        return np.asarray(kern).transpose(2, 1, 0)

    def invT1d(kern):  # flax [k,in,out] -> torch convT1d [in,out,k]
        return np.asarray(kern).transpose(1, 2, 0)

    sd["conv_pre.weight"] = inv1d(p["conv_pre"]["kernel"])
    sd["conv_pre.bias"] = np.asarray(p["conv_pre"]["bias"])
    sd["conv_post.weight"] = inv1d(p["conv_post"]["kernel"])
    sd["conv_post.bias"] = np.asarray(p["conv_post"]["bias"])
    sd["mean"] = np.asarray(p["mean"])
    sd["scale"] = np.asarray(p["scale"])
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        sd[f"upsampler.{i}.weight"] = invT1d(p[f"up_{i}"]["kernel"])
        sd[f"upsampler.{i}.bias"] = np.asarray(p[f"up_{i}"]["bias"])
        for j in range(nk):
            r = f"resblocks.{i * nk + j}."
            blk = p[f"res_{i}_{j}"]
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                sd[r + f"convs1.{d}.weight"] = inv1d(blk[f"conv1_{d}"]["kernel"])
                sd[r + f"convs1.{d}.bias"] = np.asarray(blk[f"conv1_{d}"]["bias"])
                sd[r + f"convs2.{d}.weight"] = inv1d(blk[f"conv2_{d}"]["kernel"])
                sd[r + f"convs2.{d}.bias"] = np.asarray(blk[f"conv2_{d}"]["bias"])

    return sd, model, params


def test_hifigan_converter_roundtrip():
    from spider_tpu.models.convert import convert_hifigan_state_dict
    from spider_tpu.models.vocoder import hifigan_tiny

    cfg = hifigan_tiny()
    sd, model, params = make_hifigan_sd(cfg)
    converted = convert_hifigan_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))

    # weight-norm form resolves to the same kernel
    g = np.linalg.norm(sd["conv_pre.weight"].reshape(
        sd["conv_pre.weight"].shape[0], -1), axis=1).reshape(-1, 1, 1)
    sd2 = dict(sd)
    sd2["conv_pre.weight_g"] = g
    sd2["conv_pre.weight_v"] = sd["conv_pre.weight"]
    del sd2["conv_pre.weight"]
    conv2 = convert_hifigan_state_dict(sd2, cfg)
    np.testing.assert_allclose(
        np.asarray(conv2["params"]["conv_pre"]["kernel"]),
        np.asarray(converted["params"]["conv_pre"]["kernel"]), rtol=1e-5)


def _emit_temporal_conv(sd, pre, p):
    for i in range(1, 5):
        conv_idx = 2 if i == 1 else 3
        _emit_module(sd, f"{pre}.conv{i}.0", p[f"norm{i}"])
        kern = np.asarray(p[f"conv{i}"]["kernel"])  # [3, 1, in, out]
        sd[f"{pre}.conv{i}.{conv_idx}.weight"] = \
            kern.transpose(3, 2, 0, 1)[:, :, :, :, None]
        sd[f"{pre}.conv{i}.{conv_idx}.bias"] = np.asarray(p[f"conv{i}"]["bias"])


def _emit_temporal_transformer(sd, pre, p, depth=1):
    _emit_module(sd, pre + ".norm", p["norm"])
    _emit_module(sd, pre + ".proj_in", p["proj_in"])
    _emit_module(sd, pre + ".proj_out", p["proj_out"])
    for k in range(depth):
        b = f"{pre}.transformer_blocks.{k}"
        blk = p[f"block_{k}"]
        for a in ("attn1", "attn2"):
            for pp, suffix in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                               ("out", "to_out.0")):
                _emit_module(sd, f"{b}.{a}.{suffix}", blk[f"{a}_{pp}"])
        for n in ("norm1", "norm2", "norm3"):
            _emit_module(sd, f"{b}.{n}", blk[n])
        _emit_module(sd, f"{b}.ff.net.0.proj", blk["ff_proj_in"])
        _emit_module(sd, f"{b}.ff.net.2", blk["ff_proj_out"])


@pytest.mark.slow
def make_unet3d_sd(cfg):
    from spider_tpu.models.unet3d import UNet3DConditionModel

    model = UNet3DConditionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 7, cfg.cross_attention_dim)))
    params = {"params": variables["params"]}
    p = params["params"]
    n = len(cfg.block_out_channels)
    sd = {}
    _emit_module(sd, "conv_in", p["conv_in"])
    _emit_module(sd, "time_embedding.linear_1", p["time_embed_1"])
    _emit_module(sd, "time_embedding.linear_2", p["time_embed_2"])
    _emit_module(sd, "conv_norm_out", p["norm_out"])
    _emit_module(sd, "conv_out", p["conv_out"])
    _emit_temporal_transformer(sd, "transformer_in", p["transformer_in"])
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _emit_resnet(sd, f"down_blocks.{i}.resnets.{j}",
                         p[f"down_{i}_res_{j}"], with_time=True)
            _emit_temporal_conv(sd, f"down_blocks.{i}.temp_convs.{j}",
                                p[f"down_{i}_tconv_{j}"])
            if cfg.cross_attn_blocks[i]:
                _emit_unet_attn(sd, f"down_blocks.{i}.attentions.{j}",
                                p[f"down_{i}_attn_{j}"], 1)
                _emit_temporal_transformer(
                    sd, f"down_blocks.{i}.temp_attentions.{j}",
                    p[f"down_{i}_tattn_{j}"])
        if i < n - 1:
            _emit_module(sd, f"down_blocks.{i}.downsamplers.0.conv",
                         p[f"down_{i}_downsample"])
    _emit_resnet(sd, "mid_block.resnets.0", p["mid_res_0"], with_time=True)
    _emit_temporal_conv(sd, "mid_block.temp_convs.0", p["mid_tconv_0"])
    _emit_unet_attn(sd, "mid_block.attentions.0", p["mid_attn"], 1)
    _emit_temporal_transformer(sd, "mid_block.temp_attentions.0",
                               p["mid_tattn"])
    _emit_resnet(sd, "mid_block.resnets.1", p["mid_res_1"], with_time=True)
    _emit_temporal_conv(sd, "mid_block.temp_convs.1", p["mid_tconv_1"])
    rev_attn = list(reversed(cfg.cross_attn_blocks))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _emit_resnet(sd, f"up_blocks.{i}.resnets.{j}",
                         p[f"up_{i}_res_{j}"], with_time=True)
            _emit_temporal_conv(sd, f"up_blocks.{i}.temp_convs.{j}",
                                p[f"up_{i}_tconv_{j}"])
            if rev_attn[i]:
                _emit_unet_attn(sd, f"up_blocks.{i}.attentions.{j}",
                                p[f"up_{i}_attn_{j}"], 1)
                _emit_temporal_transformer(
                    sd, f"up_blocks.{i}.temp_attentions.{j}",
                    p[f"up_{i}_tattn_{j}"])
        if i < n - 1:
            _emit_module(sd, f"up_blocks.{i}.upsamplers.0.conv",
                         p[f"up_{i}_upsample"])

    return sd, model, params


@pytest.mark.slow
def test_unet3d_converter_roundtrip():
    from spider_tpu.models.convert import convert_unet3d_state_dict
    from spider_tpu.models.unet3d import unet3d_tiny

    cfg = unet3d_tiny()
    sd, model, params = make_unet3d_sd(cfg)
    converted = convert_unet3d_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def make_clap_sd(cfg):
    from spider_tpu.models.clip_text import ClapTextModel

    model = ClapTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 6), jnp.int32))
    p = params["params"]
    sd = {}
    sd["text_model.embeddings.word_embeddings.weight"] = \
        np.asarray(p["token_embedding"]["embedding"])
    sd["text_model.embeddings.position_embeddings.weight"] = \
        np.asarray(p["position_embedding"])
    _emit_module(sd, "text_model.embeddings.LayerNorm", p["embed_ln"])
    _emit_module(sd, "text_projection.linear1", p["proj_fc1"])
    _emit_module(sd, "text_projection.linear2", p["proj_fc2"])
    for i in range(cfg.num_hidden_layers):
        b = f"text_model.encoder.layer.{i}."
        _emit_module(sd, b + "attention.self.query", p[f"l{i}_q"])
        _emit_module(sd, b + "attention.self.key", p[f"l{i}_k"])
        _emit_module(sd, b + "attention.self.value", p[f"l{i}_v"])
        _emit_module(sd, b + "attention.output.dense", p[f"l{i}_out"])
        _emit_module(sd, b + "attention.output.LayerNorm", p[f"l{i}_ln1"])
        _emit_module(sd, b + "intermediate.dense", p[f"l{i}_fc1"])
        _emit_module(sd, b + "output.dense", p[f"l{i}_fc2"])
        _emit_module(sd, b + "output.LayerNorm", p[f"l{i}_ln2"])

    return sd, model, params


@pytest.mark.slow
def test_clap_converter_roundtrip():
    from spider_tpu.models.clip_text import clap_tiny
    from spider_tpu.models.convert import convert_clap_text_state_dict

    cfg = clap_tiny()
    sd, model, params = make_clap_sd(cfg)
    converted = convert_clap_text_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


@pytest.mark.slow
def make_grounding_dino_sd(cfg):
    from spider_tpu.models.dino import GroundingDINO

    model = GroundingDINO(cfg)
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)),
                        ids, mask)
    p = params["params"]
    sd = {}

    # ---- swin backbone (reuse the swin emitter) ----
    bp = p["backbone"]
    _emit_module(sd, "backbone.patch_embed.projection", bp["patch_embed"])
    _emit_module(sd, "backbone.patch_embed.norm", bp["patch_norm"])
    scfg = cfg.backbone
    for s, depth in enumerate(scfg.depths):
        for b in range(depth):
            base = f"backbone.stages.{s}.blocks.{b}."
            blk = bp[f"stage{s}_block{b}"]
            _emit_module(sd, base + "norm1", blk["norm1"])
            _emit_module(sd, base + "norm2", blk["norm2"])
            sd[base + "attn.w_msa.qkv.weight"] = np.concatenate(
                [np.asarray(blk[x]["kernel"]).T for x in "qkv"], axis=0)
            sd[base + "attn.w_msa.qkv.bias"] = np.concatenate(
                [np.asarray(blk[x]["bias"]) for x in "qkv"], axis=0)
            _emit_module(sd, base + "attn.w_msa.proj", blk["proj"])
            sd[base + "attn.w_msa.relative_position_bias_table"] = \
                np.asarray(blk["rel_pos_bias"])
            _emit_module(sd, base + "ffn.layers.0.0", blk["fc1"])
            _emit_module(sd, base + "ffn.layers.1", blk["fc2"])
        if s < len(scfg.depths) - 1:
            _emit_module(sd, f"backbone.stages.{s}.downsample.norm",
                         bp[f"merge{s}"]["norm"])
            sd[f"backbone.stages.{s}.downsample.reduction.weight"] = \
                np.asarray(bp[f"merge{s}"]["reduction"]["kernel"]).T
        if s in scfg.out_indices:
            _emit_module(sd, f"backbone.norm{s}", bp[f"out_norm{s}"])

    # ---- bert (reuse the bert emitter pattern) ----
    bq = p["bert"]
    BP = "language_model.language_backbone.body.model."
    sd[BP + "embeddings.word_embeddings.weight"] = \
        np.asarray(bq["word_embeddings"]["embedding"])
    sd[BP + "embeddings.position_embeddings.weight"] = \
        np.asarray(bq["position_embeddings"]["embedding"])
    sd[BP + "embeddings.token_type_embeddings.weight"] = \
        np.asarray(bq["token_type_embeddings"]["embedding"])
    _emit_module(sd, BP + "embeddings.LayerNorm", bq["embed_ln"])
    _emit_module(sd, BP + "pooler.dense", bq["pooler"])
    for i in range(cfg.bert.num_hidden_layers):
        b = BP + f"encoder.layer.{i}."
        lay = bq[f"layer_{i}"]
        _emit_module(sd, b + "attention.self.query", lay["query"])
        _emit_module(sd, b + "attention.self.key", lay["key"])
        _emit_module(sd, b + "attention.self.value", lay["value"])
        _emit_module(sd, b + "attention.output.dense", lay["attn_out"])
        _emit_module(sd, b + "attention.output.LayerNorm", lay["attn_ln"])
        _emit_module(sd, b + "intermediate.dense", lay["intermediate"])
        _emit_module(sd, b + "output.dense", lay["output"])
        _emit_module(sd, b + "output.LayerNorm", lay["out_ln"])

    # ---- detector heads ----
    _emit_module(sd, "text_feat_map", p["text_proj"])
    sd["level_embed"] = np.asarray(p["level_embed"])
    sd["query_embedding.weight"] = np.asarray(p["query_embedding"])
    _emit_module(sd, "memory_trans_fc", p["enc_out_proj"])
    _emit_module(sd, "memory_trans_norm", p["enc_out_ln"])
    _emit_module(sd, "decoder.norm", p["decoder_norm"])
    _emit_module(sd, "decoder.ref_point_head.layers.0", p["ref_point_fc1"])
    _emit_module(sd, "decoder.ref_point_head.layers.1", p["ref_point_fc2"])
    for i in range(cfg.num_levels - 1):
        _emit_module(sd, f"neck.convs.{i}.conv", p[f"neck_in{i}"])
        _emit_module(sd, f"neck.convs.{i}.gn", p[f"neck_gn{i}"])
    _emit_module(sd, "neck.extra_convs.0.conv", p["neck_extra"])
    _emit_module(sd, "neck.extra_convs.0.gn", p["neck_extra_gn"])

    def emit_fused(pre, q, k, v, out):
        sd[pre + ".in_proj_weight"] = np.concatenate(
            [np.asarray(x["kernel"]).T for x in (q, k, v)], axis=0)
        sd[pre + ".in_proj_bias"] = np.concatenate(
            [np.asarray(x["bias"]) for x in (q, k, v)], axis=0)
        _emit_module(sd, pre + ".out_proj", out)

    def emit_msda(pre, m):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            _emit_module(sd, f"{pre}.{n}", m[n])

    def emit_ffn(pre, fc1, fc2):
        _emit_module(sd, pre + ".layers.0.0", fc1)
        _emit_module(sd, pre + ".layers.1", fc2)

    for i in range(cfg.enc_layers):
        e = p[f"enc_{i}"]
        emit_msda(f"encoder.layers.{i}.self_attn", e["msda"])
        _emit_module(sd, f"encoder.layers.{i}.norms.0", e["img_ln1"])
        _emit_module(sd, f"encoder.layers.{i}.norms.1", e["img_ln2"])
        emit_ffn(f"encoder.layers.{i}.ffn", e["img_fc1"], e["img_fc2"])
        emit_fused(f"encoder.text_layers.{i}.self_attn.attn",
                   e["txt_q"], e["txt_k"], e["txt_v"], e["txt_attn_out"])
        _emit_module(sd, f"encoder.text_layers.{i}.norms.0", e["txt_ln1"])
        _emit_module(sd, f"encoder.text_layers.{i}.norms.1", e["txt_ln2"])
        emit_ffn(f"encoder.text_layers.{i}.ffn", e["txt_fc1"], e["txt_fc2"])
        f = e["fusion"]
        fus = f"encoder.fusion_layers.{i}."
        _emit_module(sd, fus + "layer_norm_v", f["ln_img"])
        _emit_module(sd, fus + "layer_norm_l", f["ln_txt"])
        _emit_module(sd, fus + "attn.v_proj", f["img_q"])
        _emit_module(sd, fus + "attn.l_proj", f["txt_k"])
        _emit_module(sd, fus + "attn.values_v_proj", f["img_v"])
        _emit_module(sd, fus + "attn.values_l_proj", f["txt_v"])
        _emit_module(sd, fus + "attn.out_v_proj", f["img_out"])
        _emit_module(sd, fus + "attn.out_l_proj", f["txt_out"])
        sd[fus + "gamma_v"] = np.asarray(f["gamma_img"])
        sd[fus + "gamma_l"] = np.asarray(f["gamma_txt"])

    for i in range(cfg.dec_layers):
        d = p[f"dec_{i}"]
        emit_fused(f"decoder.layers.{i}.self_attn.attn",
                   d["self_q"], d["self_k"], d["self_v"], d["self_out"])
        emit_fused(f"decoder.layers.{i}.cross_attn_text.attn",
                   d["txt_q"], d["txt_k"], d["txt_v"], d["txt_out"])
        emit_msda(f"decoder.layers.{i}.cross_attn", d["msda"])
        for j in range(4):
            _emit_module(sd, f"decoder.layers.{i}.norms.{j}", d[f"ln{j+1}"])
        emit_ffn(f"decoder.layers.{i}.ffn", d["fc1"], d["fc2"])
        bh = p[f"dec_box_head_{i}"]
        _emit_module(sd, f"bbox_head.reg_branches.{i}.0", bh["fc0"])
        _emit_module(sd, f"bbox_head.reg_branches.{i}.2", bh["fc1"])
        _emit_module(sd, f"bbox_head.reg_branches.{i}.4", bh["out"])
    eb = p["enc_box_head"]
    _emit_module(sd, f"bbox_head.reg_branches.{cfg.dec_layers}.0", eb["fc0"])
    _emit_module(sd, f"bbox_head.reg_branches.{cfg.dec_layers}.2", eb["fc1"])
    _emit_module(sd, f"bbox_head.reg_branches.{cfg.dec_layers}.4", eb["out"])
    # ContrastiveEmbed scalar biases (log_scale='auto', bias=True): final
    # decoder branch + encoder (two-stage) branch
    sd[f"bbox_head.cls_branches.{cfg.dec_layers - 1}.bias"] = \
        np.asarray(p["cls_bias"])
    sd[f"bbox_head.cls_branches.{cfg.dec_layers}.bias"] = \
        np.asarray(p["enc_cls_bias"])

    return sd, model, params


@pytest.mark.slow
def test_grounding_dino_converter_roundtrip():
    from spider_tpu.models.convert import convert_grounding_dino_state_dict
    from spider_tpu.models.dino import grounding_dino_test

    cfg = grounding_dino_test()
    sd, model, params = make_grounding_dino_sd(cfg)
    converted = convert_grounding_dino_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_hifigan_matches_speecht5():
    """Converted HifiGan vs transformers SpeechT5HifiGan, including the
    torch ConvTranspose1d(padding=(k-s)//2) upsampling semantics
    (ops/convs.ConvTranspose1dTorch)."""
    torch = pytest.importorskip("torch")
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    from spider_tpu.models.convert import convert_hifigan_state_dict
    from spider_tpu.models.vocoder import HifiGan, hifigan_tiny

    cfg = hifigan_tiny()
    hcfg = SpeechT5HifiGanConfig(
        model_in_dim=cfg.model_in_dim,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in
                                 cfg.resblock_dilation_sizes],
        normalize_before=cfg.normalize_before)
    torch.manual_seed(0)
    tm = SpeechT5HifiGan(hcfg).eval()

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 13, cfg.model_in_dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(mel)).numpy()

    params = convert_hifigan_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    got = np.asarray(HifiGan(cfg).apply(params, jnp.asarray(mel)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


# ----------------------------------------------------------------- photomaker

def make_photomaker_sd(cfg):
    """Inverse-emit a PhotoMaker id_encoder state dict (utils/model.py
    naming) from a random-init PhotoMakerIDEncoder."""
    from spider_tpu.models.photomaker import PhotoMakerIDEncoder

    enc = PhotoMakerIDEncoder(cfg)
    params = enc.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 77, cfg.embed_dim)),
        jnp.zeros((1, 77), jnp.int32))["params"]
    sd = {}
    vm = params["vision_model"]
    sd["vision_model.embeddings.class_embedding"] = \
        np.asarray(vm["class_embedding"])
    sd["vision_model.embeddings.position_embedding.weight"] = \
        np.asarray(vm["position_embedding"])
    _emit_module(sd, "vision_model.embeddings.patch_embedding",
                 vm["patch_embedding"])
    _emit_module(sd, "vision_model.pre_layrnorm", vm["pre_layrnorm"])
    _emit_module(sd, "vision_model.post_layernorm", vm["post_layernorm"])
    for i in range(cfg.num_hidden_layers):
        blk = vm[f"layers_{i}"]
        b = f"vision_model.encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _emit_module(sd, b + f"self_attn.{n}", blk[n])
        _emit_module(sd, b + "layer_norm1", blk["layer_norm1"])
        _emit_module(sd, b + "layer_norm2", blk["layer_norm2"])
        _emit_module(sd, b + "mlp.fc1", blk["fc1"])
        _emit_module(sd, b + "mlp.fc2", blk["fc2"])
    _emit_module(sd, "visual_projection", params["visual_projection"])
    _emit_module(sd, "visual_projection_2", params["visual_projection_2"])
    fm = params["fuse_module"]
    for m in ("mlp1", "mlp2"):
        _emit_module(sd, f"fuse_module.{m}.layernorm", fm[m]["layernorm"])
        _emit_module(sd, f"fuse_module.{m}.fc1", fm[m]["fc1"])
        _emit_module(sd, f"fuse_module.{m}.fc2", fm[m]["fc2"])
    _emit_module(sd, "fuse_module.layer_norm", fm["layer_norm"])
    return sd, enc, {"params": params}
