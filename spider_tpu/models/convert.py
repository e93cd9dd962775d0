"""Checkpoint converters: torch/HF state dicts -> spider-tpu param trees.

Covers the external checkpoints Spider loads (SURVEY.md §7.2 "weight
conversion for 6 external checkpoints"): Llama/DeepSeek (HF), CLIP text
encoders, diffusers AutoencoderKL, BERT, SAM. Conventions:
  * torch Linear weight [out, in] -> flax kernel [in, out] (transpose)
  * torch Conv2d weight [out, in, kh, kw] -> flax [kh, kw, in, out]
  * scanned Llama layers stack per-layer tensors on a leading [L] axis
  * optional int8 weight-only quantization of Llama projections.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _conv(w) -> np.ndarray:
    """[out, in, kh, kw] -> [kh, kw, in, out]."""
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .safetensors shards or torch .bin/.pth into numpy."""
    out: Dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path)
            if f.endswith((".safetensors", ".bin", ".pth", ".pt")))
        for f in files:
            out.update(load_torch_state_dict(os.path.join(path, f)))
        return out
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v) for k, v in load_file(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Llama / DeepSeek-R1-Distill-Llama
# ---------------------------------------------------------------------------

def convert_llama_state_dict(sd: Dict[str, np.ndarray], cfg,
                             quantize: Optional[str] = None) -> Dict:
    """HF LlamaForCausalLM names -> scanned flax tree."""
    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(L)]
        ws = [_t(w) if transpose else np.asarray(w, np.float32) for w in ws]
        return np.stack(ws, axis=0)

    def proj(arr):
        if quantize == "int8":
            scale = np.max(np.abs(arr), axis=-2, keepdims=True) / 127.0
            scale = np.maximum(scale, 1e-8)
            q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            return {"kernel_q": q, "kernel_scale": scale.squeeze(-2)}
        return {"kernel": arr}

    attn = {
        name: proj(stack(f"model.layers.{{}}.self_attn.{name}.weight"))
        for name in ("q_proj", "k_proj", "v_proj", "o_proj")
    }
    if cfg.attention_bias:
        for name in ("q_proj", "k_proj", "v_proj"):
            attn[name]["bias"] = stack(
                f"model.layers.{{}}.self_attn.{name}.bias", transpose=False)
    mlp = {
        name: proj(stack(f"model.layers.{{}}.mlp.{name}.weight"))
        for name in ("gate_proj", "up_proj", "down_proj")
    }
    params = {
        "embed_tokens": {"embedding": np.asarray(
            sd["model.embed_tokens.weight"], np.float32)},
        "model": {
            "layers": {
                "self_attn": attn,
                "mlp": mlp,
                "input_layernorm": stack(
                    "model.layers.{}.input_layernorm.weight", transpose=False),
                "post_attention_layernorm": stack(
                    "model.layers.{}.post_attention_layernorm.weight",
                    transpose=False),
            },
            "norm": np.asarray(sd["model.norm.weight"], np.float32),
        },
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = proj(_t(sd["lm_head.weight"]))
    return {"params": _to_jnp(params)}


def _to_jnp(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def convert_llama_checkpoint(path: str, quantize: Optional[str] = None):
    """HF checkpoint dir (config.json + weights) -> (LlamaConfig, params)."""
    import dataclasses

    from spider_tpu.models import llama as L

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    rope_scaling = hf.get("rope_scaling")
    if rope_scaling and "rope_type" in rope_scaling:
        rope_scaling = {k: v for k, v in rope_scaling.items()
                        if k != "rope_type"}
    cfg = L.LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quantization=quantize,
        # Qwen2 family: qkv biases (hf attention_bias flag or model_type)
        attention_bias=hf.get("attention_bias",
                              hf.get("model_type") == "qwen2"),
    )
    sd = load_torch_state_dict(path)
    params = convert_llama_state_dict(sd, cfg, quantize)
    return cfg, params


def extend_llama_embeddings(params: Dict, new_vocab_size: int,
                            rng=None) -> Dict:
    """resize_token_embeddings analogue (spider.py:177): copy old rows,
    normal-init new ones. Returns a new tree."""
    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    emb = np.asarray(p["params"]["embed_tokens"]["embedding"])
    V, H = emb.shape
    if new_vocab_size > V:
        mean, std = emb.mean(0), emb.std(0).mean()
        extra = np.random.default_rng(0).normal(
            0, 0.02, (new_vocab_size - V, H)).astype(emb.dtype) + mean
        p["params"]["embed_tokens"]["embedding"] = jnp.asarray(
            np.concatenate([emb, extra], axis=0))
        if "lm_head" in p["params"]:
            head = np.asarray(p["params"]["lm_head"]["kernel"])
            extra_h = np.random.default_rng(1).normal(
                0, 0.02, (H, new_vocab_size - V)).astype(head.dtype)
            p["params"]["lm_head"]["kernel"] = jnp.asarray(
                np.concatenate([head, extra_h], axis=1))
    return p


# ---------------------------------------------------------------------------
# CLIP text encoder (openai/clip-vit-* text_model.* naming)
# ---------------------------------------------------------------------------

def convert_clip_text_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    p: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(
            sd[f"{pre}embeddings.token_embedding.weight"], np.float32)},
        "position_embedding": np.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"], np.float32),
        "final_layer_norm": {
            "scale": np.asarray(sd[f"{pre}final_layer_norm.weight"], np.float32),
            "bias": np.asarray(sd[f"{pre}final_layer_norm.bias"], np.float32)},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"{pre}encoder.layers.{i}."
        p[f"layers_{i}"] = {
            "layer_norm1": {"scale": np.asarray(sd[b + "layer_norm1.weight"]),
                            "bias": np.asarray(sd[b + "layer_norm1.bias"])},
            "layer_norm2": {"scale": np.asarray(sd[b + "layer_norm2.weight"]),
                            "bias": np.asarray(sd[b + "layer_norm2.bias"])},
            **{n: {"kernel": _t(sd[b + f"self_attn.{n}.weight"]),
                   "bias": np.asarray(sd[b + f"self_attn.{n}.bias"])}
               for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": {"kernel": _t(sd[b + "mlp.fc1.weight"]),
                    "bias": np.asarray(sd[b + "mlp.fc1.bias"])},
            "fc2": {"kernel": _t(sd[b + "mlp.fc2.weight"]),
                    "bias": np.asarray(sd[b + "mlp.fc2.bias"])},
        }
    if "text_projection.weight" in sd and cfg.projection_dim:
        p["text_projection"] = {"kernel": _t(sd["text_projection.weight"])}
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# BERT (bert-base-uncased naming)
# ---------------------------------------------------------------------------

def convert_bert_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": np.asarray(
            sd[f"{pre}embeddings.word_embeddings.weight"], np.float32)},
        "position_embeddings": {"embedding": np.asarray(
            sd[f"{pre}embeddings.position_embeddings.weight"], np.float32)},
        "token_type_embeddings": {"embedding": np.asarray(
            sd[f"{pre}embeddings.token_type_embeddings.weight"], np.float32)},
        "embed_ln": {
            "scale": np.asarray(sd[f"{pre}embeddings.LayerNorm.weight"]),
            "bias": np.asarray(sd[f"{pre}embeddings.LayerNorm.bias"])},
        "pooler": {"kernel": _t(sd[f"{pre}pooler.dense.weight"]),
                   "bias": np.asarray(sd[f"{pre}pooler.dense.bias"])}
        if f"{pre}pooler.dense.weight" in sd else
        {"kernel": np.zeros((cfg.hidden_size, cfg.hidden_size), np.float32),
         "bias": np.zeros((cfg.hidden_size,), np.float32)},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"{pre}encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "query": {"kernel": _t(sd[b + "attention.self.query.weight"]),
                      "bias": np.asarray(sd[b + "attention.self.query.bias"])},
            "key": {"kernel": _t(sd[b + "attention.self.key.weight"]),
                    "bias": np.asarray(sd[b + "attention.self.key.bias"])},
            "value": {"kernel": _t(sd[b + "attention.self.value.weight"]),
                      "bias": np.asarray(sd[b + "attention.self.value.bias"])},
            "attn_out": {"kernel": _t(sd[b + "attention.output.dense.weight"]),
                         "bias": np.asarray(sd[b + "attention.output.dense.bias"])},
            "attn_ln": {
                "scale": np.asarray(sd[b + "attention.output.LayerNorm.weight"]),
                "bias": np.asarray(sd[b + "attention.output.LayerNorm.bias"])},
            "intermediate": {"kernel": _t(sd[b + "intermediate.dense.weight"]),
                             "bias": np.asarray(sd[b + "intermediate.dense.bias"])},
            "output": {"kernel": _t(sd[b + "output.dense.weight"]),
                       "bias": np.asarray(sd[b + "output.dense.bias"])},
            "out_ln": {"scale": np.asarray(sd[b + "output.LayerNorm.weight"]),
                       "bias": np.asarray(sd[b + "output.LayerNorm.bias"])},
        }
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL -> spider_tpu.models.vae
# ---------------------------------------------------------------------------

def _gn(sd, key):
    """GroupNorm/LayerNorm weights -> flax {'scale','bias'}."""
    return {"scale": np.asarray(sd[key + ".weight"], np.float32),
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _c(sd, key):
    """Conv weights -> flax {'kernel','bias'} (OIHW -> HWIO)."""
    out = {"kernel": _conv(sd[key + ".weight"])}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"], np.float32)
    return out


def _d(sd, key):
    """Linear (or 1x1-conv-stored) weights -> flax Dense {'kernel','bias'}."""
    w = np.asarray(sd[key + ".weight"], np.float32)
    if w.ndim == 4:  # [out, in, 1, 1] conv form
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"], np.float32)
    return out


def _vae_resnet(sd, pre):
    p = {"norm1": _gn(sd, pre + ".norm1"), "conv1": _c(sd, pre + ".conv1"),
         "norm2": _gn(sd, pre + ".norm2"), "conv2": _c(sd, pre + ".conv2")}
    if pre + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _c(sd, pre + ".conv_shortcut")
    return p


def _vae_attn(sd, pre):
    return {"norm": _gn(sd, pre + ".group_norm"),
            "q": _d(sd, pre + ".to_q"), "k": _d(sd, pre + ".to_k"),
            "v": _d(sd, pre + ".to_v"),
            "proj_out": _d(sd, pre + ".to_out.0")}


def convert_vae_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """diffusers AutoencoderKL names -> spider_tpu AutoencoderKL tree."""
    n_blocks = len(cfg.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": _c(sd, "encoder.conv_in"),
                           "norm_out": _gn(sd, "encoder.conv_norm_out"),
                           "conv_out": _c(sd, "encoder.conv_out"),
                           "quant_conv": _c(sd, "quant_conv")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            enc[f"down_{i}_downsample"] = _c(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    enc["mid_res_0"] = _vae_resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_res_1"] = _vae_resnet(sd, "encoder.mid_block.resnets.1")
    enc["mid_attn"] = _vae_attn(sd, "encoder.mid_block.attentions.0")

    dec: Dict[str, Any] = {"conv_in": _c(sd, "decoder.conv_in"),
                           "norm_out": _gn(sd, "decoder.conv_norm_out"),
                           "conv_out": _c(sd, "decoder.conv_out"),
                           "post_quant_conv": _c(sd, "post_quant_conv")}
    dec["mid_res_0"] = _vae_resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_res_1"] = _vae_resnet(sd, "decoder.mid_block.resnets.1")
    dec["mid_attn"] = _vae_attn(sd, "decoder.mid_block.attentions.0")
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            dec[f"up_{i}_upsample"] = _c(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"params": _to_jnp({"encoder": enc, "decoder": dec})}


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel -> spider_tpu.models.unet2d
# ---------------------------------------------------------------------------

def _unet_resnet(sd, pre):
    p = _vae_resnet(sd, pre)
    p["time_emb_proj"] = _d(sd, pre + ".time_emb_proj")
    return p


def _unet_tfm_block(sd, pre):
    def attn(a):
        return {"to_q": _d(sd, f"{pre}.{a}.to_q"),
                "to_k": _d(sd, f"{pre}.{a}.to_k"),
                "to_v": _d(sd, f"{pre}.{a}.to_v"),
                "to_out": _d(sd, f"{pre}.{a}.to_out.0")}

    return {"norm1": _gn(sd, pre + ".norm1"),
            "norm2": _gn(sd, pre + ".norm2"),
            "norm3": _gn(sd, pre + ".norm3"),
            "attn1": attn("attn1"), "attn2": attn("attn2"),
            "ff": {"proj_in": _d(sd, pre + ".ff.net.0.proj"),
                   "proj_out": _d(sd, pre + ".ff.net.2")}}


def _unet_attn(sd, pre, depth):
    p = {"norm": _gn(sd, pre + ".norm"),
         "proj_in": _d(sd, pre + ".proj_in"),
         "proj_out": _d(sd, pre + ".proj_out")}
    for k in range(depth):
        p[f"block_{k}"] = _unet_tfm_block(sd, f"{pre}.transformer_blocks.{k}")
    return p


def convert_unet2d_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """diffusers UNet2DConditionModel names -> spider_tpu UNet2DCondition
    tree (SD-1.5 / SDXL / AudioLDM layouts)."""
    n = len(cfg.block_out_channels)
    p: Dict[str, Any] = {
        "conv_in": _c(sd, "conv_in"),
        "time_embed_1": _d(sd, "time_embedding.linear_1"),
        "time_embed_2": _d(sd, "time_embedding.linear_2"),
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _c(sd, "conv_out"),
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embed_1"] = _d(sd, "add_embedding.linear_1")
        p["add_embed_2"] = _d(sd, "add_embedding.linear_2")
    elif cfg.addition_embed_type == "class_embed":
        p["class_embed_1"] = _d(sd, "class_embedding.linear_1")
        p["class_embed_2"] = _d(sd, "class_embedding.linear_2")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_res_{j}"] = _unet_resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.cross_attn_blocks[i] and cfg.transformer_layers_per_block[i]:
                p[f"down_{i}_attn_{j}"] = _unet_attn(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    cfg.transformer_layers_per_block[i])
        if i < n - 1:
            p[f"down_{i}_downsample"] = _c(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
    p["mid_res_0"] = _unet_resnet(sd, "mid_block.resnets.0")
    p["mid_res_1"] = _unet_resnet(sd, "mid_block.resnets.1")
    if "mid_block.attentions.0.norm.weight" in sd:
        p["mid_attn"] = _unet_attn(sd, "mid_block.attentions.0",
                                   max(cfg.transformer_layers_per_block[-1], 1))
    rev_attn = list(reversed(cfg.cross_attn_blocks))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _unet_resnet(
                sd, f"up_blocks.{i}.resnets.{j}")
            if rev_attn[i] and rev_depth[i]:
                p[f"up_{i}_attn_{j}"] = _unet_attn(
                    sd, f"up_blocks.{i}.attentions.{j}", rev_depth[i])
        if i < n - 1:
            p[f"up_{i}_upsample"] = _c(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# Segment Anything (sam_vit_*.pth) -> spider_tpu.models.sam
# ---------------------------------------------------------------------------

def _convT(w) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out]."""
    return np.asarray(w, np.float32).transpose(2, 3, 0, 1)


def convert_sam_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Official SAM checkpoint names -> spider_tpu Sam tree. The fused qkv is
    split; mask_downscaling (mask-input prompts) is unused by Spider and
    skipped."""
    C = cfg.encoder_width
    enc: Dict[str, Any] = {
        "patch_embed": _c(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": np.asarray(sd["image_encoder.pos_embed"], np.float32),
        "neck_conv1": {"kernel": _conv(sd["image_encoder.neck.0.weight"])},
        "neck_ln1": _gn(sd, "image_encoder.neck.1"),
        "neck_conv2": {"kernel": _conv(sd["image_encoder.neck.2.weight"])},
        "neck_ln2": _gn(sd, "image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_layers):
        b = f"image_encoder.blocks.{i}."
        qkv_w = np.asarray(sd[b + "attn.qkv.weight"], np.float32)  # [3C, C]
        qkv_b = np.asarray(sd[b + "attn.qkv.bias"], np.float32)
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        blk = {
            "ln1": _gn(sd, b + "norm1"),
            "ln2": _gn(sd, b + "norm2"),
            "q": {"kernel": qw.T, "bias": qb},
            "k": {"kernel": kw.T, "bias": kb},
            "v": {"kernel": vw.T, "bias": vb},
            "proj": _d(sd, b + "attn.proj"),
            "fc1": _d(sd, b + "mlp.lin1"),
            "fc2": _d(sd, b + "mlp.lin2"),
        }
        if b + "attn.rel_pos_h" in sd:
            blk["rel_pos_h"] = np.asarray(sd[b + "attn.rel_pos_h"], np.float32)
            blk["rel_pos_w"] = np.asarray(sd[b + "attn.rel_pos_w"], np.float32)
        enc[f"block_{i}"] = blk

    pe: Dict[str, Any] = {
        "pe_gaussian": np.asarray(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
            np.float32),
        "point_embeddings": np.concatenate(
            [np.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"],
                        np.float32) for i in range(4)], axis=0),
        "not_a_point": np.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"], np.float32),
        "no_mask_embed": np.asarray(
            sd["prompt_encoder.no_mask_embed.weight"], np.float32),
    }

    md: Dict[str, Any] = {
        "iou_token": np.asarray(sd["mask_decoder.iou_token.weight"], np.float32),
        "mask_tokens": np.asarray(sd["mask_decoder.mask_tokens.weight"],
                                  np.float32),
        "upscale_1": {
            "kernel": _convT(sd["mask_decoder.output_upscaling.0.weight"]),
            "bias": np.asarray(sd["mask_decoder.output_upscaling.0.bias"],
                               np.float32)},
        "upscale_ln": _gn(sd, "mask_decoder.output_upscaling.1"),
        "upscale_2": {
            "kernel": _convT(sd["mask_decoder.output_upscaling.3.weight"]),
            "bias": np.asarray(sd["mask_decoder.output_upscaling.3.bias"],
                               np.float32)},
        "final_q": _d(sd, "mask_decoder.transformer.final_attn_token_to_image.q_proj"),
        "final_k": _d(sd, "mask_decoder.transformer.final_attn_token_to_image.k_proj"),
        "final_v": _d(sd, "mask_decoder.transformer.final_attn_token_to_image.v_proj"),
        "final_out": _d(sd, "mask_decoder.transformer.final_attn_token_to_image.out_proj"),
        "final_ln": _gn(sd, "mask_decoder.transformer.norm_final_attn"),
    }
    for i in range(cfg.decoder_depth):
        b = f"mask_decoder.transformer.layers.{i}."
        md[f"block_{i}"] = {
            "self_q": _d(sd, b + "self_attn.q_proj"),
            "self_k": _d(sd, b + "self_attn.k_proj"),
            "self_v": _d(sd, b + "self_attn.v_proj"),
            "self_out": _d(sd, b + "self_attn.out_proj"),
            "ln1": _gn(sd, b + "norm1"),
            "cross_qk_q": _d(sd, b + "cross_attn_token_to_image.q_proj"),
            "cross_qk_k": _d(sd, b + "cross_attn_token_to_image.k_proj"),
            "cross_qk_v": _d(sd, b + "cross_attn_token_to_image.v_proj"),
            "cross_qk_out": _d(sd, b + "cross_attn_token_to_image.out_proj"),
            "ln2": _gn(sd, b + "norm2"),
            "fc1": _d(sd, b + "mlp.lin1"),
            "fc2": _d(sd, b + "mlp.lin2"),
            "ln3": _gn(sd, b + "norm3"),
            "cross_kq_q": _d(sd, b + "cross_attn_image_to_token.q_proj"),
            "cross_kq_k": _d(sd, b + "cross_attn_image_to_token.k_proj"),
            "cross_kq_v": _d(sd, b + "cross_attn_image_to_token.v_proj"),
            "cross_kq_out": _d(sd, b + "cross_attn_image_to_token.out_proj"),
            "ln4": _gn(sd, b + "norm4"),
        }
    num_tokens = cfg.num_multimask_outputs + 1
    for i in range(num_tokens):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
        md[f"hyper_{i}_fc0"] = _d(sd, h + "0")
        md[f"hyper_{i}_fc1"] = _d(sd, h + "1")
        md[f"hyper_{i}_out"] = _d(sd, h + "2")
    ih = "mask_decoder.iou_prediction_head.layers."
    md["iou_fc0"] = _d(sd, ih + "0")
    md["iou_fc1"] = _d(sd, ih + "1")
    md["iou_out"] = _d(sd, ih + "2")

    return {"params": _to_jnp({"image_encoder": enc, "prompt_encoder": pe,
                               "mask_decoder": md})}


# ---------------------------------------------------------------------------
# ImageBind (imagebind_huge.pth) -> spider_tpu.models.imagebind
# ---------------------------------------------------------------------------

def _first(sd, *candidates):
    for c in candidates:
        if c in sd:
            return sd[c]
    raise KeyError(f"none of {candidates} in checkpoint "
                   f"(has {len(sd)} keys)")


def _ib_trunk(sd, modality: str, layers: int) -> Dict[str, Any]:
    """modality_trunks.<m>.* + preprocessor cls/pos -> our Trunk tree."""
    t = {}
    t["cls_token"] = np.asarray(
        _first(sd, f"modality_preprocessors.{modality}.cls_token"),
        np.float32).reshape(1, 1, -1)
    t["pos_embed"] = np.asarray(
        _first(sd,
               f"modality_preprocessors.{modality}.pos_embedding_helper.pos_embed",
               f"modality_preprocessors.{modality}.pos_embed"),
        np.float32)
    pre_w = f"modality_trunks.{modality}.pre_transformer_layer.0.weight"
    if pre_w in sd:
        t["pre_ln"] = {"scale": np.asarray(sd[pre_w], np.float32),
                       "bias": np.asarray(
                           sd[pre_w.replace("weight", "bias")], np.float32)}
    for i in range(layers):
        b = f"modality_trunks.{modality}.blocks.{i}."
        in_w = np.asarray(_first(sd, b + "attn.in_proj_weight"), np.float32)
        in_b = np.asarray(_first(sd, b + "attn.in_proj_bias"), np.float32)
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        t[f"block_{i}"] = {
            "ln1": _gn(sd, b + "norm_1"),
            "ln2": _gn(sd, b + "norm_2"),
            "q": {"kernel": qw.T, "bias": qb},
            "k": {"kernel": kw.T, "bias": kb},
            "v": {"kernel": vw.T, "bias": vb},
            "proj": _d(sd, b + "attn.out_proj"),
            "fc1": _d(sd, b + "mlp.fc1"),
            "fc2": _d(sd, b + "mlp.fc2"),
        }
    return t


def convert_imagebind_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Official ImageBind checkpoint -> spider_tpu ImageBindEncoder tree
    (vision + audio trunks and heads — the subset Spider uses)."""
    p: Dict[str, Any] = {}
    # vision stem: Conv3d [W, 3, F, k, k] -> flax [F, k, k, 3, W]
    vision_stem = np.asarray(
        _first(sd, "modality_preprocessors.vision.rgbt_stem.proj.1.weight",
               "modality_preprocessors.vision.rgbt_stem.proj.weight"),
        np.float32)
    p["vision_patch"] = {"kernel": vision_stem.transpose(2, 3, 4, 1, 0)}
    audio_stem = np.asarray(
        _first(sd, "modality_preprocessors.audio.rgbt_stem.proj.weight",
               "modality_preprocessors.audio.audio_stem.proj.weight"),
        np.float32)
    p["audio_patch"] = {"kernel": _conv(audio_stem)}
    p["vision_trunk"] = _ib_trunk(sd, "vision", cfg.vision.layers)
    p["audio_trunk"] = _ib_trunk(sd, "audio", cfg.audio.layers)
    # heads: Sequential(LN, SelectElement, Linear(bias=False))
    for m, head, ln in (("vision", "vision_head", "vision_head_ln"),
                        ("audio", "audio_head", "audio_head_ln")):
        p[ln] = _gn(sd, f"modality_heads.{m}.0")
        p[head] = {"kernel": _t(_first(sd, f"modality_heads.{m}.2.weight"))}
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# Swin backbone (mmdet naming: backbone.stages.*.blocks.*.attn.w_msa.*)
# -> spider_tpu.models.swin
# ---------------------------------------------------------------------------

def convert_swin_state_dict(sd: Dict[str, np.ndarray], cfg,
                            prefix: str = "backbone.") -> Dict:
    """mmdet SwinTransformer names -> spider_tpu SwinTransformer tree.
    Fused qkv is split; relative_position_bias_table maps directly."""
    p: Dict[str, Any] = {
        "patch_embed": _c(sd, prefix + "patch_embed.projection"),
        "patch_norm": _gn(sd, prefix + "patch_embed.norm"),
    }
    out_i = 0
    for s, depth in enumerate(cfg.depths):
        for b in range(depth):
            base = f"{prefix}stages.{s}.blocks.{b}."
            qkv_w = np.asarray(sd[base + "attn.w_msa.qkv.weight"], np.float32)
            qkv_b = np.asarray(sd[base + "attn.w_msa.qkv.bias"], np.float32)
            qw, kw, vw = np.split(qkv_w, 3, axis=0)
            qb, kb, vb = np.split(qkv_b, 3, axis=0)
            p[f"stage{s}_block{b}"] = {
                "norm1": _gn(sd, base + "norm1"),
                "norm2": _gn(sd, base + "norm2"),
                "q": {"kernel": qw.T, "bias": qb},
                "k": {"kernel": kw.T, "bias": kb},
                "v": {"kernel": vw.T, "bias": vb},
                "proj": _d(sd, base + "attn.w_msa.proj"),
                "rel_pos_bias": np.asarray(
                    sd[base + "attn.w_msa.relative_position_bias_table"],
                    np.float32),
                "fc1": _d(sd, base + "ffn.layers.0.0"),
                "fc2": _d(sd, base + "ffn.layers.1"),
            }
        if s < len(cfg.depths) - 1:
            p[f"merge{s}"] = {
                "norm": _gn(sd, f"{prefix}stages.{s}.downsample.norm"),
                "reduction": {"kernel": _t(
                    sd[f"{prefix}stages.{s}.downsample.reduction.weight"])},
            }
        if s in cfg.out_indices:
            p[f"out_norm{s}"] = _gn(sd, f"{prefix}norm{s}")
            out_i += 1
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# SpeechT5 HiFiGAN vocoder -> spider_tpu.models.vocoder
# ---------------------------------------------------------------------------

def _conv1d(w) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return np.asarray(w, np.float32).transpose(2, 1, 0)


def _convT1d(w) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> flax [k, in, out]."""
    return np.asarray(w, np.float32).transpose(2, 0, 1)


def _wn(sd, key):
    """Resolve a (possibly weight-normed) conv weight."""
    if key + ".weight" in sd:
        return np.asarray(sd[key + ".weight"], np.float32)
    g = np.asarray(sd[key + ".weight_g"], np.float32)
    v = np.asarray(sd[key + ".weight_v"], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_hifigan_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """HF SpeechT5HifiGan names -> spider_tpu HifiGan tree."""
    p: Dict[str, Any] = {
        "conv_pre": {"kernel": _conv1d(_wn(sd, "conv_pre")),
                     "bias": np.asarray(sd["conv_pre.bias"], np.float32)},
        "conv_post": {"kernel": _conv1d(_wn(sd, "conv_post")),
                      "bias": np.asarray(sd["conv_post.bias"], np.float32)},
    }
    if cfg.normalize_before:
        p["mean"] = np.asarray(sd["mean"], np.float32)
        p["scale"] = np.asarray(sd["scale"], np.float32)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = {"kernel": _convT1d(_wn(sd, f"upsampler.{i}")),
                        "bias": np.asarray(sd[f"upsampler.{i}.bias"],
                                           np.float32)}
        for j in range(n_kernels):
            r = f"resblocks.{i * n_kernels + j}."
            blk: Dict[str, Any] = {}
            for d in range(len(cfg.resblock_dilation_sizes[j])):
                blk[f"conv1_{d}"] = {
                    "kernel": _conv1d(_wn(sd, r + f"convs1.{d}")),
                    "bias": np.asarray(sd[r + f"convs1.{d}.bias"], np.float32)}
                blk[f"conv2_{d}"] = {
                    "kernel": _conv1d(_wn(sd, r + f"convs2.{d}")),
                    "bias": np.asarray(sd[r + f"convs2.{d}.bias"], np.float32)}
            p[f"res_{i}_{j}"] = blk
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# diffusers UNet3DConditionModel (ZeroScope) -> spider_tpu.models.unet3d
# ---------------------------------------------------------------------------

def _conv3d_t(w) -> np.ndarray:
    """torch Conv3d [out, in, 3, 1, 1] (temporal-only kernel) -> flax (3, 1)
    conv [3, 1, in, out] (unet3d.TemporalConv's [B, F, H*W, C] layout)."""
    w = np.asarray(w, np.float32)
    return w[:, :, :, :, 0].transpose(2, 3, 1, 0)


def _temporal_conv(sd, pre):
    p = {}
    for i in range(1, 5):
        # Sequential(GroupNorm, SiLU[, Dropout], Conv3d): conv index is 2
        # for conv1, 3 otherwise.
        conv_idx = 2 if i == 1 else 3
        p[f"norm{i}"] = _gn(sd, f"{pre}.conv{i}.0")
        p[f"conv{i}"] = {
            "kernel": _conv3d_t(sd[f"{pre}.conv{i}.{conv_idx}.weight"]),
            "bias": np.asarray(sd[f"{pre}.conv{i}.{conv_idx}.bias"],
                               np.float32)}
    return p


def _temporal_transformer(sd, pre, depth=1):
    p = {"norm": _gn(sd, pre + ".norm"),
         "proj_in": _d(sd, pre + ".proj_in"),
         "proj_out": _d(sd, pre + ".proj_out")}
    for k in range(depth):
        b = f"{pre}.transformer_blocks.{k}"
        blk = {}
        for a in ("attn1", "attn2"):
            blk[f"{a}_q"] = _d(sd, f"{b}.{a}.to_q")
            blk[f"{a}_k"] = _d(sd, f"{b}.{a}.to_k")
            blk[f"{a}_v"] = _d(sd, f"{b}.{a}.to_v")
            blk[f"{a}_out"] = _d(sd, f"{b}.{a}.to_out.0")
        for n in ("norm1", "norm2", "norm3"):
            blk[n] = _gn(sd, f"{b}.{n}")
        blk["ff_proj_in"] = _d(sd, f"{b}.ff.net.0.proj")
        blk["ff_proj_out"] = _d(sd, f"{b}.ff.net.2")
        p[f"block_{k}"] = blk
    return p


def convert_unet3d_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """diffusers UNet3DConditionModel names -> spider_tpu UNet3DCondition
    tree (ZeroScope layout: resnets/temp_convs/attentions/temp_attentions +
    transformer_in)."""
    n = len(cfg.block_out_channels)
    p: Dict[str, Any] = {
        "conv_in": _c(sd, "conv_in"),
        "time_embed_1": _d(sd, "time_embedding.linear_1"),
        "time_embed_2": _d(sd, "time_embedding.linear_2"),
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _c(sd, "conv_out"),
        "transformer_in": _temporal_transformer(sd, "transformer_in"),
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_res_{j}"] = _unet_resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            p[f"down_{i}_tconv_{j}"] = _temporal_conv(
                sd, f"down_blocks.{i}.temp_convs.{j}")
            if cfg.cross_attn_blocks[i]:
                p[f"down_{i}_attn_{j}"] = _unet_attn(
                    sd, f"down_blocks.{i}.attentions.{j}", 1)
                p[f"down_{i}_tattn_{j}"] = _temporal_transformer(
                    sd, f"down_blocks.{i}.temp_attentions.{j}")
        if i < n - 1:
            p[f"down_{i}_downsample"] = _c(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
    p["mid_res_0"] = _unet_resnet(sd, "mid_block.resnets.0")
    p["mid_tconv_0"] = _temporal_conv(sd, "mid_block.temp_convs.0")
    p["mid_attn"] = _unet_attn(sd, "mid_block.attentions.0", 1)
    p["mid_tattn"] = _temporal_transformer(sd, "mid_block.temp_attentions.0")
    p["mid_res_1"] = _unet_resnet(sd, "mid_block.resnets.1")
    p["mid_tconv_1"] = _temporal_conv(sd, "mid_block.temp_convs.1")
    rev_attn = list(reversed(cfg.cross_attn_blocks))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _unet_resnet(
                sd, f"up_blocks.{i}.resnets.{j}")
            p[f"up_{i}_tconv_{j}"] = _temporal_conv(
                sd, f"up_blocks.{i}.temp_convs.{j}")
            if rev_attn[i]:
                p[f"up_{i}_attn_{j}"] = _unet_attn(
                    sd, f"up_blocks.{i}.attentions.{j}", 1)
                p[f"up_{i}_tattn_{j}"] = _temporal_transformer(
                    sd, f"up_blocks.{i}.temp_attentions.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = _c(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# CLAP text branch (HF laion/clap: RoBERTa body + 2-layer projection)
# -> spider_tpu.models.clip_text.ClapTextModel
# ---------------------------------------------------------------------------

def convert_clap_text_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    p: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(
            sd[f"{pre}embeddings.word_embeddings.weight"], np.float32)},
        "position_embedding": np.asarray(
            sd[f"{pre}embeddings.position_embeddings.weight"], np.float32),
        "embed_ln": {
            "scale": np.asarray(sd[f"{pre}embeddings.LayerNorm.weight"],
                                np.float32),
            "bias": np.asarray(sd[f"{pre}embeddings.LayerNorm.bias"],
                               np.float32)},
        "proj_fc1": _d(sd, "text_projection.linear1"),
        "proj_fc2": _d(sd, "text_projection.linear2"),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"{pre}encoder.layer.{i}."
        p[f"l{i}_q"] = _d(sd, b + "attention.self.query")
        p[f"l{i}_k"] = _d(sd, b + "attention.self.key")
        p[f"l{i}_v"] = _d(sd, b + "attention.self.value")
        p[f"l{i}_out"] = _d(sd, b + "attention.output.dense")
        p[f"l{i}_ln1"] = {
            "scale": np.asarray(sd[b + "attention.output.LayerNorm.weight"]),
            "bias": np.asarray(sd[b + "attention.output.LayerNorm.bias"])}
        p[f"l{i}_fc1"] = _d(sd, b + "intermediate.dense")
        p[f"l{i}_fc2"] = _d(sd, b + "output.dense")
        p[f"l{i}_ln2"] = {
            "scale": np.asarray(sd[b + "output.LayerNorm.weight"]),
            "bias": np.asarray(sd[b + "output.LayerNorm.bias"])}
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# Grounding DINO (mm_grounding_dino checkpoint) -> spider_tpu.models.dino
# ---------------------------------------------------------------------------

def _mha_fused(sd, pre):
    """torch nn.MultiheadAttention -> separate q/k/v/out Dense trees."""
    w = np.asarray(sd[pre + ".in_proj_weight"], np.float32)
    b = np.asarray(sd[pre + ".in_proj_bias"], np.float32)
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)
    return (
        {"kernel": qw.T, "bias": qb},
        {"kernel": kw.T, "bias": kb},
        {"kernel": vw.T, "bias": vb},
        _d(sd, pre + ".out_proj"),
    )


def _msda_tree(sd, pre):
    return {name: _d(sd, f"{pre}.{name}")
            for name in ("sampling_offsets", "attention_weights",
                         "value_proj", "output_proj")}


def _ffn_tree(sd, pre):
    return (_d(sd, pre + ".layers.0.0"), _d(sd, pre + ".layers.1"))


def _box_mlp(sd, pre):
    return {"fc0": _d(sd, pre + ".0"), "fc1": _d(sd, pre + ".2"),
            "out": _d(sd, pre + ".4")}


def convert_grounding_dino_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """mmdet GroundingDINO names -> spider_tpu GroundingDINO tree.

    NOTE: validated structurally via the inverse-roundtrip test AND against
    the real checkpoint's key list (tests/fixtures/mm_grounding_dino_keys);
    ContrastiveEmbed (log_scale='auto', bias=True) maps each branch's
    scalar bias: the final decoder branch -> cls_bias, the encoder
    (two-stage proposal) branch -> enc_cls_bias.
    """
    p: Dict[str, Any] = {
        "cls_bias": np.asarray(
            sd[f"bbox_head.cls_branches.{cfg.dec_layers - 1}.bias"],
            np.float32),
        "enc_cls_bias": np.asarray(
            sd[f"bbox_head.cls_branches.{cfg.dec_layers}.bias"], np.float32),
        "backbone": convert_swin_state_dict(sd, cfg.backbone,
                                            prefix="backbone.")["params"],
        "text_proj": _d(sd, "text_feat_map"),
        "level_embed": np.asarray(sd["level_embed"], np.float32),
        "query_embedding": np.asarray(sd["query_embedding.weight"],
                                      np.float32),
        "enc_out_proj": _d(sd, "memory_trans_fc"),
        "enc_out_ln": _gn(sd, "memory_trans_norm"),
        "decoder_norm": _gn(sd, "decoder.norm"),
        "ref_point_fc1": _d(sd, "decoder.ref_point_head.layers.0"),
        "ref_point_fc2": _d(sd, "decoder.ref_point_head.layers.1"),
    }
    # BERT under language_model.*: strip to HF names for the bert converter.
    bert_prefix = "language_model.language_backbone.body.model."
    # read via __getitem__ so consumed-key tracking (test_convert_manifests)
    # sees the whole BERT subtree
    bert_sd = {k[len(bert_prefix):]: sd[k] for k in list(sd)
               if k.startswith(bert_prefix)}
    p["bert"] = convert_bert_state_dict(bert_sd, cfg.bert)["params"]
    # neck
    for i in range(cfg.num_levels - 1):
        p[f"neck_in{i}"] = _c(sd, f"neck.convs.{i}.conv")
        p[f"neck_gn{i}"] = _gn(sd, f"neck.convs.{i}.gn")
    p["neck_extra"] = _c(sd, "neck.extra_convs.0.conv")
    p["neck_extra_gn"] = _gn(sd, "neck.extra_convs.0.gn")
    # encoder layers
    for i in range(cfg.enc_layers):
        img = f"encoder.layers.{i}."
        txt = f"encoder.text_layers.{i}."
        fus = f"encoder.fusion_layers.{i}."
        tq, tk, tv, tout = _mha_fused(sd, txt + "self_attn.attn")
        fc1, fc2 = _ffn_tree(sd, img + "ffn")
        tfc1, tfc2 = _ffn_tree(sd, txt + "ffn")
        p[f"enc_{i}"] = {
            "msda": _msda_tree(sd, img + "self_attn"),
            "img_ln1": _gn(sd, img + "norms.0"),
            "img_ln2": _gn(sd, img + "norms.1"),
            "img_fc1": fc1, "img_fc2": fc2,
            "txt_q": tq, "txt_k": tk, "txt_v": tv, "txt_attn_out": tout,
            "txt_ln1": _gn(sd, txt + "norms.0"),
            "txt_ln2": _gn(sd, txt + "norms.1"),
            "txt_fc1": tfc1, "txt_fc2": tfc2,
            "fusion": {
                "ln_img": _gn(sd, fus + "layer_norm_v"),
                "ln_txt": _gn(sd, fus + "layer_norm_l"),
                "img_q": _d(sd, fus + "attn.v_proj"),
                "txt_k": _d(sd, fus + "attn.l_proj"),
                "img_v": _d(sd, fus + "attn.values_v_proj"),
                "txt_v": _d(sd, fus + "attn.values_l_proj"),
                "img_out": _d(sd, fus + "attn.out_v_proj"),
                "txt_out": _d(sd, fus + "attn.out_l_proj"),
                "gamma_img": np.asarray(sd[fus + "gamma_v"], np.float32),
                "gamma_txt": np.asarray(sd[fus + "gamma_l"], np.float32),
            },
        }
    # decoder layers + per-layer box branches
    for i in range(cfg.dec_layers):
        d = f"decoder.layers.{i}."
        sq, sk, sv, sout = _mha_fused(sd, d + "self_attn.attn")
        tq, tk, tv, tout = _mha_fused(sd, d + "cross_attn_text.attn")
        fc1, fc2 = _ffn_tree(sd, d + "ffn")
        p[f"dec_{i}"] = {
            "self_q": sq, "self_k": sk, "self_v": sv, "self_out": sout,
            "txt_q": tq, "txt_k": tk, "txt_v": tv, "txt_out": tout,
            "msda": _msda_tree(sd, d + "cross_attn"),
            "ln1": _gn(sd, d + "norms.0"),
            "ln2": _gn(sd, d + "norms.1"),
            "ln3": _gn(sd, d + "norms.2"),
            "ln4": _gn(sd, d + "norms.3"),
            "fc1": fc1, "fc2": fc2,
        }
        p[f"dec_box_head_{i}"] = _box_mlp(sd, f"bbox_head.reg_branches.{i}")
    # encoder-output (two-stage) box head = the extra reg branch
    p["enc_box_head"] = _box_mlp(sd,
                                 f"bbox_head.reg_branches.{cfg.dec_layers}")
    return {"params": _to_jnp(p)}


# ---------------------------------------------------------------------------
# Qwen2.5-Omni thinker (transformers qwen2_5_omni) -> spider_tpu flax
# ---------------------------------------------------------------------------

def _conv1d_k(w) -> np.ndarray:
    """torch Conv1d [out, in, K] -> flax [K, in, out]."""
    return np.asarray(w, np.float32).transpose(2, 1, 0)


def convert_omni_audio_tower(sd: Dict[str, np.ndarray], cfg,
                             prefix: str = "audio_tower.") -> Dict:
    """Qwen2_5OmniAudioEncoder weights -> models/qwen_omni.OmniAudioEncoder.

    Source naming: modeling_qwen2_5_omni.py Qwen2_5OmniAudioEncoder
    (conv1/conv2, layers.N.self_attn.{q,k,v,out}_proj + *_layer_norm +
    fc1/fc2, ln_post, proj). The sinusoidal positional table is a
    non-persistent buffer (recomputed), and audio_bos_eos_token is unused
    at inference — both intentionally absent here."""
    g = lambda k: prefix + k
    p = {
        "conv1": {"kernel": _conv1d_k(sd[g("conv1.weight")]),
                  "bias": np.asarray(sd[g("conv1.bias")], np.float32)},
        "conv2": {"kernel": _conv1d_k(sd[g("conv2.weight")]),
                  "bias": np.asarray(sd[g("conv2.bias")], np.float32)},
        "ln_post": _gn(sd, g("ln_post")),
        "proj": _d(sd, g("proj")),
    }
    for i in range(cfg.num_layers):
        b = g(f"layers.{i}")
        p[f"layer_{i}"] = {
            "self_attn_layer_norm": _gn(sd, f"{b}.self_attn_layer_norm"),
            "final_layer_norm": _gn(sd, f"{b}.final_layer_norm"),
            "self_attn": {
                "q_proj": _d(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _d(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _d(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _d(sd, f"{b}.self_attn.out_proj"),
            },
            "fc1": _d(sd, f"{b}.fc1"),
            "fc2": _d(sd, f"{b}.fc2"),
        }
    return {"params": _to_jnp(p)}


def convert_omni_vision_tower(sd: Dict[str, np.ndarray], cfg,
                              prefix: str = "visual.") -> Dict:
    """Qwen2_5OmniVisionEncoder weights -> models/qwen_omni.OmniVisionEncoder.

    Source naming: patch_embed.proj (bias-free Conv3d, flattened to a
    Dense over (C, tp, p, p) patch vectors), blocks.N.{norm1,norm2}
    (RMSNorm), blocks.N.attn.{q,k,v,proj}, blocks.N.mlp.{gate,up,down}_proj,
    merger.{ln_q,mlp.0,mlp.2}."""
    g = lambda k: prefix + k
    w = np.asarray(sd[g("patch_embed.proj.weight")], np.float32)
    p = {
        "patch_embed": {"kernel": w.reshape(w.shape[0], -1).T},
        "ln_q": np.asarray(sd[g("merger.ln_q.weight")], np.float32),
        "merge_fc1": _d(sd, g("merger.mlp.0")),
        "merge_fc2": _d(sd, g("merger.mlp.2")),
    }
    for i in range(cfg.depth):
        b = g(f"blocks.{i}")
        p[f"block_{i}"] = {
            "norm1": np.asarray(sd[f"{b}.norm1.weight"], np.float32),
            "norm2": np.asarray(sd[f"{b}.norm2.weight"], np.float32),
            "attn": {
                "q": _d(sd, f"{b}.attn.q"),
                "k": _d(sd, f"{b}.attn.k"),
                "v": _d(sd, f"{b}.attn.v"),
                "proj": _d(sd, f"{b}.attn.proj"),
            },
            "mlp_gate": _d(sd, f"{b}.mlp.gate_proj"),
            "mlp_up": _d(sd, f"{b}.mlp.up_proj"),
            "mlp_down": _d(sd, f"{b}.mlp.down_proj"),
        }
    return {"params": _to_jnp(p)}


def convert_omni_thinker(sd: Dict[str, np.ndarray], audio_cfg, vision_cfg,
                         llm_cfg):
    """Full thinker state dict (audio_tower.* + visual.* + model.* +
    lm_head.*) -> (audio_params, vision_params, llm_params). Accepts both
    bare-thinker checkpoints and full-Omni ones ('thinker.'-prefixed)."""
    if any(k.startswith("thinker.") for k in sd):
        sd = {k[len("thinker."):]: v for k, v in sd.items()
              if k.startswith("thinker.")}
    aparams = convert_omni_audio_tower(sd, audio_cfg)
    vparams = convert_omni_vision_tower(sd, vision_cfg)
    lparams = convert_llama_state_dict(
        {k: v for k, v in sd.items()
         if k.startswith(("model.", "lm_head."))}, llm_cfg)
    return aparams, vparams, lparams


def convert_omni_talker(sd: Dict[str, np.ndarray], cfg,
                        prefix: str = "talker.") -> Dict:
    """Qwen2_5OmniTalkerForConditionalGeneration weights ->
    models/omni_talker.OmniTalker.

    Source naming (modeling_qwen2_5_omni.py): thinker_to_talker_proj,
    model.embed_tokens / model.layers.N.{self_attn,mlp,*norm} / model.norm
    (a Qwen2 decoder — reuses convert_llama_state_dict), codec_head.
    Accepts both bare-talker and full-Omni ('talker.'-prefixed) dicts."""
    if any(k.startswith(prefix) for k in sd):
        sd = {k[len(prefix):]: sd[k] for k in list(sd)
              if k.startswith(prefix)}
    # getitem-based rebuild (not .items()) so key-consumption audits
    # (tests/test_convert_manifests.py TrackingDict) see these reads
    base = convert_llama_state_dict(
        {k: sd[k] for k in list(sd) if k.startswith("model.")},
        cfg.as_llama(), quantize=cfg.quantization)
    p = base["params"]
    p["thinker_to_talker_proj"] = _to_jnp(_d(sd, "thinker_to_talker_proj"))
    p["codec_head"] = _to_jnp({"kernel": _t(sd["codec_head.weight"])})
    return {"params": p}


def _d1(sd, key):
    """torch Conv1d k=1 [out, in, 1] -> flax Dense {'kernel','bias'}."""
    w = np.asarray(sd[key + ".weight"], np.float32)[:, :, 0]
    out = {"kernel": w.T}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"], np.float32)
    return out


def _tdnn(sd, key):
    """TimeDelayNetBlock -> omni_token2wav.TDNNBlock {'conv': ...}."""
    return {"conv": {"kernel": _conv1d(sd[key + ".conv.weight"]),
                     "bias": np.asarray(sd[key + ".conv.bias"], np.float32)}}


def convert_omni_dit(sd: Dict[str, np.ndarray], cfg,
                     prefix: str = "token2wav.code2wav_dit_model.") -> Dict:
    """Qwen2_5OmniToken2WavDiTModel weights -> omni_token2wav.DiTModel.

    Source naming (modeling_qwen2_5_omni.py): time_embed.time_mlp.{0,2},
    text_embed.codec_embed, input_embed.{proj,spk_encoder.*} (ECAPA:
    blocks.0 TDNN, blocks.1..3 SE-Res2Net, mfa, asp.{tdnn,conv}, fc),
    transformer_blocks.N.{attn_norm.linear, attn.to_{q,k,v}/to_out.0,
    ff.ff.{0,3}}, norm_out.linear, proj_out."""
    if any(k.startswith(prefix) for k in sd):
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    enc = "input_embed.spk_encoder."
    spk = {"block_0": _tdnn(sd, enc + "blocks.0"),
           "mfa": _tdnn(sd, enc + "mfa"),
           "asp": {"tdnn": _tdnn(sd, enc + "asp.tdnn"),
                   "conv": _d1(sd, enc + "asp.conv")},
           "fc": _d1(sd, enc + "fc")}
    for i in range(1, len(cfg.enc_channels) - 1):
        b = enc + f"blocks.{i}."
        res2 = {f"block_{j}": _tdnn(sd, b + f"res2net_block.blocks.{j}")
                for j in range(cfg.enc_res2net_scale - 1)}
        spk[f"block_{i}"] = {
            "tdnn1": _tdnn(sd, b + "tdnn1"),
            "tdnn2": _tdnn(sd, b + "tdnn2"),
            "res2net_block": res2,
            "se_block": {"conv1": _d1(sd, b + "se_block.conv1"),
                         "conv2": _d1(sd, b + "se_block.conv2")},
        }
    p = {
        "time_mlp_in": _d(sd, "time_embed.time_mlp.0"),
        "time_mlp_out": _d(sd, "time_embed.time_mlp.2"),
        "codec_embed": {"embedding": np.asarray(
            sd["text_embed.codec_embed.weight"], np.float32)},
        "input_proj": _d(sd, "input_embed.proj"),
        "spk_encoder": spk,
        "norm_out_linear": _d(sd, "norm_out.linear"),
        "proj_out": _d(sd, "proj_out"),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"transformer_blocks.{i}."
        p[f"layer_{i}"] = {
            "attn_norm_linear": _d(sd, b + "attn_norm.linear"),
            "attn": {"to_q": _d(sd, b + "attn.to_q"),
                     "to_k": _d(sd, b + "attn.to_k"),
                     "to_v": _d(sd, b + "attn.to_v"),
                     "to_out": _d(sd, b + "attn.to_out.0")},
            "ff_in": _d(sd, b + "ff.ff.0"),
            "ff_out": _d(sd, b + "ff.ff.3"),
        }
    return {"params": _to_jnp(p)}


def convert_omni_bigvgan(sd: Dict[str, np.ndarray], cfg,
                         prefix: str = "token2wav.code2wav_bigvgan_model."
                         ) -> Dict:
    """Qwen2_5OmniToken2WavBigVGANModel weights -> omni_token2wav.BigVGAN.

    Source naming: conv_pre, ups.N.0 (ConvTranspose1d), resblocks.{i*R+j}
    AMP blocks (convs1/convs2 + activations.2m/.2m+1 SnakeBeta alpha/beta
    inside TorchActivation1d), activation_post.act, conv_post."""
    if any(k.startswith(prefix) for k in sd):
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    snake = lambda key: {
        "alpha": np.asarray(sd[key + ".alpha"], np.float32),
        "beta": np.asarray(sd[key + ".beta"], np.float32)}
    p = {
        "conv_pre": {"kernel": _conv1d(sd["conv_pre.weight"]),
                     "bias": np.asarray(sd["conv_pre.bias"], np.float32)},
        "activation_post": snake("activation_post.act"),
        "conv_post": {"kernel": _conv1d(sd["conv_post.weight"])},
    }
    R = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = {
            "kernel": _convT1d(sd[f"ups.{i}.0.weight"]),
            "bias": np.asarray(sd[f"ups.{i}.0.bias"], np.float32)}
        for j in range(R):
            b = f"resblocks.{i * R + j}."
            blk = {}
            for m in range(len(cfg.resblock_dilation_sizes[j])):
                blk[f"conv1_{m}"] = {
                    "kernel": _conv1d(sd[b + f"convs1.{m}.weight"]),
                    "bias": np.asarray(sd[b + f"convs1.{m}.bias"],
                                       np.float32)}
                blk[f"conv2_{m}"] = {
                    "kernel": _conv1d(sd[b + f"convs2.{m}.weight"]),
                    "bias": np.asarray(sd[b + f"convs2.{m}.bias"],
                                       np.float32)}
                blk[f"act1_{m}"] = snake(b + f"activations.{2 * m}.act")
                blk[f"act2_{m}"] = snake(b + f"activations.{2 * m + 1}.act")
            p[f"res_{i}_{j}"] = blk
    return {"params": _to_jnp(p)}


def convert_omni_token2wav(sd: Dict[str, np.ndarray], dit_cfg, bigvgan_cfg):
    """Full Qwen2_5OmniToken2WavModel dict -> (dit_params, bigvgan_params)."""
    return (convert_omni_dit(sd, dit_cfg),
            convert_omni_bigvgan(sd, bigvgan_cfg))


# ---------------------------------------------------------------------------
# PhotoMaker ID encoder (StoryDiffusion "Using Ref Images";
# /root/reference/StoryDiffusion/utils/model.py PhotoMakerIDEncoder — the
# photomaker-v1.bin checkpoint's "id_encoder" sub-dict)
# ---------------------------------------------------------------------------

def convert_photomaker_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """id_encoder state dict -> PhotoMakerIDEncoder params. Pass the inner
    dict of the checkpoint's "id_encoder" key (the file also carries
    "lora_weights" for the UNet, applied separately)."""
    def ln(key):
        return {"scale": np.asarray(sd[key + ".weight"], np.float32),
                "bias": np.asarray(sd[key + ".bias"], np.float32)}

    vm = "vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _conv(sd[vm + "embeddings.patch_embedding.weight"])},
        "class_embedding": np.asarray(
            sd[vm + "embeddings.class_embedding"], np.float32),
        "position_embedding": np.asarray(
            sd[vm + "embeddings.position_embedding.weight"], np.float32),
        "pre_layrnorm": ln(vm + "pre_layrnorm"),
        "post_layernorm": ln(vm + "post_layernorm"),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"{vm}encoder.layers.{i}."
        vision[f"layers_{i}"] = {
            "layer_norm1": ln(b + "layer_norm1"),
            "layer_norm2": ln(b + "layer_norm2"),
            **{n: {"kernel": _t(sd[b + f"self_attn.{n}.weight"]),
                   "bias": np.asarray(sd[b + f"self_attn.{n}.bias"])}
               for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": {"kernel": _t(sd[b + "mlp.fc1.weight"]),
                    "bias": np.asarray(sd[b + "mlp.fc1.bias"])},
            "fc2": {"kernel": _t(sd[b + "mlp.fc2.weight"]),
                    "bias": np.asarray(sd[b + "mlp.fc2.bias"])},
        }

    def fuse_mlp(pre):
        return {"layernorm": ln(pre + ".layernorm"),
                "fc1": {"kernel": _t(sd[pre + ".fc1.weight"]),
                        "bias": np.asarray(sd[pre + ".fc1.bias"])},
                "fc2": {"kernel": _t(sd[pre + ".fc2.weight"]),
                        "bias": np.asarray(sd[pre + ".fc2.bias"])}}

    p = {
        "vision_model": vision,
        "visual_projection": {"kernel": _t(sd["visual_projection.weight"])},
        "visual_projection_2": {
            "kernel": _t(sd["visual_projection_2.weight"])},
        "fuse_module": {"mlp1": fuse_mlp("fuse_module.mlp1"),
                        "mlp2": fuse_mlp("fuse_module.mlp2"),
                        "layer_norm": ln("fuse_module.layer_norm")},
    }
    return {"params": _to_jnp(p)}
