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


def test_vae_converter_roundtrip():
    cfg = vae_tiny()
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


def test_unet2d_converter_roundtrip():
    cfg = unet_tiny()
    model = UNet2DConditionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 7, cfg.cross_attention_dim)))
    params = {"params": variables["params"]}  # drop the sown 'story' capture
    p = params["params"]
    n = len(cfg.block_out_channels)
    sd = {}
    _emit_module(sd, "conv_in", p["conv_in"])
    _emit_module(sd, "time_embedding.linear_1", p["time_embed_1"])
    _emit_module(sd, "time_embedding.linear_2", p["time_embed_2"])
    _emit_module(sd, "conv_norm_out", p["norm_out"])
    _emit_module(sd, "conv_out", p["conv_out"])
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

    converted = convert_unet2d_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))
