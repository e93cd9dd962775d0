import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models import llama as L
from spider_tpu.models.clip_text import CLIPTextModel, clip_tiny
from spider_tpu.models.bert import BertModel, bert_test
from spider_tpu.models.convert import (convert_bert_state_dict,
                                       convert_clip_text_state_dict,
                                       convert_llama_state_dict,
                                       extend_llama_embeddings)


def _fake_llama_sd(cfg, rng):
    H, I = cfg.hidden_size, cfg.intermediate_size
    D = cfg.head_dim_
    kv = cfg.num_key_value_heads * D
    sd = {
        "model.embed_tokens.weight": rng.normal(0, 0.02, (cfg.vocab_size, H)),
        "model.norm.weight": rng.normal(1, 0.01, (H,)),
        "lm_head.weight": rng.normal(0, 0.02, (cfg.vocab_size, H)),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"model.layers.{i}."
        sd[b + "self_attn.q_proj.weight"] = rng.normal(0, 0.02, (H, H))
        sd[b + "self_attn.k_proj.weight"] = rng.normal(0, 0.02, (kv, H))
        sd[b + "self_attn.v_proj.weight"] = rng.normal(0, 0.02, (kv, H))
        sd[b + "self_attn.o_proj.weight"] = rng.normal(0, 0.02, (H, H))
        sd[b + "mlp.gate_proj.weight"] = rng.normal(0, 0.02, (I, H))
        sd[b + "mlp.up_proj.weight"] = rng.normal(0, 0.02, (I, H))
        sd[b + "mlp.down_proj.weight"] = rng.normal(0, 0.02, (H, I))
        sd[b + "input_layernorm.weight"] = rng.normal(1, 0.01, (H,))
        sd[b + "post_attention_layernorm.weight"] = rng.normal(1, 0.01, (H,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_llama_conversion_runs_and_quantization_close():
    cfg = L.llama_tiny(vocab_size=128)
    rng = np.random.default_rng(0)
    sd = _fake_llama_sd(cfg, rng)

    params = convert_llama_state_dict(sd, cfg)
    model = L.LlamaForCausalLM(cfg)
    ids = jnp.array([[1, 5, 9, 3]])
    logits, _, _ = model.apply(params, ids)
    assert logits.shape == (1, 4, 128)
    assert np.isfinite(np.asarray(logits)).all()
    # structure matches random init exactly
    ref = model.init(jax.random.PRNGKey(0), ids)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)

    # int8 weight-only conversion approximates fp32
    qcfg = dataclasses.replace(cfg, quantization="int8")
    qparams = convert_llama_state_dict(sd, qcfg, quantize="int8")
    qmodel = L.LlamaForCausalLM(qcfg)
    qlogits, _, _ = qmodel.apply(qparams, ids)
    # compare top-1 predictions (quantization-tolerant)
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(qlogits), -1)).mean()
    assert agree >= 0.75
    err = np.mean(np.abs(np.asarray(logits) - np.asarray(qlogits)))
    assert err < 0.1


def test_embed_extension_preserves_rows():
    cfg = L.llama_tiny(vocab_size=64)
    sd = _fake_llama_sd(cfg, np.random.default_rng(1))
    params = convert_llama_state_dict(sd, cfg)
    ext = extend_llama_embeddings(params, 80)
    emb0 = np.asarray(params["params"]["embed_tokens"]["embedding"])
    emb1 = np.asarray(ext["params"]["embed_tokens"]["embedding"])
    assert emb1.shape == (80, cfg.hidden_size)
    np.testing.assert_array_equal(emb0, emb1[:64])
    head1 = np.asarray(ext["params"]["lm_head"]["kernel"])
    assert head1.shape == (cfg.hidden_size, 80)


def make_clip_sd(cfg, rng=None):
    rng = rng or np.random.default_rng(0)
    H, I = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "text_model.embeddings.token_embedding.weight":
            rng.normal(0, 0.02, (cfg.vocab_size, H)).astype(np.float32),
        "text_model.embeddings.position_embedding.weight":
            rng.normal(0, 0.02, (77, H)).astype(np.float32),
        "text_model.final_layer_norm.weight": np.ones((H,), np.float32),
        "text_model.final_layer_norm.bias": np.zeros((H,), np.float32),
    }
    if cfg.projection_dim:
        sd["text_projection.weight"] = \
            rng.normal(0, 0.02, (cfg.projection_dim, H)).astype(np.float32)
    for i in range(cfg.num_hidden_layers):
        b = f"text_model.encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[b + f"self_attn.{n}.weight"] = rng.normal(0, 0.02, (H, H)).astype(np.float32)
            sd[b + f"self_attn.{n}.bias"] = np.zeros((H,), np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[b + f"{ln}.weight"] = np.ones((H,), np.float32)
            sd[b + f"{ln}.bias"] = np.zeros((H,), np.float32)
        sd[b + "mlp.fc1.weight"] = rng.normal(0, 0.02, (I, H)).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros((I,), np.float32)
        sd[b + "mlp.fc2.weight"] = rng.normal(0, 0.02, (H, I)).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros((H,), np.float32)
    return sd


def test_clip_conversion_structure():
    cfg = clip_tiny(vocab_size=100)
    sd = make_clip_sd(cfg)
    params = convert_clip_text_state_dict(sd, cfg)
    model = CLIPTextModel(cfg)
    ids = jnp.array([[5, 6, 2, 0]])
    ref = model.init(jax.random.PRNGKey(0), ids)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    last, hiddens, pooled = model.apply(params, ids)
    assert np.isfinite(np.asarray(last)).all()


def make_bert_sd(cfg, rng=None):
    rng = rng or np.random.default_rng(0)
    H, I = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "bert.embeddings.word_embeddings.weight":
            rng.normal(0, 0.02, (cfg.vocab_size, H)).astype(np.float32),
        "bert.embeddings.position_embeddings.weight":
            rng.normal(0, 0.02, (cfg.max_position_embeddings, H)).astype(np.float32),
        "bert.embeddings.token_type_embeddings.weight":
            rng.normal(0, 0.02, (2, H)).astype(np.float32),
        "bert.embeddings.LayerNorm.weight": np.ones((H,), np.float32),
        "bert.embeddings.LayerNorm.bias": np.zeros((H,), np.float32),
        "bert.pooler.dense.weight": rng.normal(0, 0.02, (H, H)).astype(np.float32),
        "bert.pooler.dense.bias": np.zeros((H,), np.float32),
    }
    for i in range(cfg.num_hidden_layers):
        b = f"bert.encoder.layer.{i}."
        for n in ("attention.self.query", "attention.self.key",
                  "attention.self.value", "attention.output.dense"):
            sd[b + n + ".weight"] = rng.normal(0, 0.02, (H, H)).astype(np.float32)
            sd[b + n + ".bias"] = np.zeros((H,), np.float32)
        sd[b + "attention.output.LayerNorm.weight"] = np.ones((H,), np.float32)
        sd[b + "attention.output.LayerNorm.bias"] = np.zeros((H,), np.float32)
        sd[b + "intermediate.dense.weight"] = rng.normal(0, 0.02, (I, H)).astype(np.float32)
        sd[b + "intermediate.dense.bias"] = np.zeros((I,), np.float32)
        sd[b + "output.dense.weight"] = rng.normal(0, 0.02, (H, I)).astype(np.float32)
        sd[b + "output.dense.bias"] = np.zeros((H,), np.float32)
        sd[b + "output.LayerNorm.weight"] = np.ones((H,), np.float32)
        sd[b + "output.LayerNorm.bias"] = np.zeros((H,), np.float32)
    return sd


def test_bert_conversion_structure():
    cfg = bert_test()
    sd = make_bert_sd(cfg)
    params = convert_bert_state_dict(sd, cfg)
    model = BertModel(cfg)
    ids = jnp.array([[1, 5, 9, 0]])
    ref = model.init(jax.random.PRNGKey(0), ids)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    seq, pooled = model.apply(params, ids)
    assert np.isfinite(np.asarray(seq)).all()


def test_qwen2_style_conversion_with_bias():
    cfg = dataclasses.replace(L.llama_tiny(vocab_size=64),
                              attention_bias=True)
    rng = np.random.default_rng(2)
    sd = _fake_llama_sd(cfg, rng)
    D = cfg.head_dim_
    for i in range(cfg.num_hidden_layers):
        b = f"model.layers.{i}.self_attn."
        sd[b + "q_proj.bias"] = rng.normal(0, 0.01, (cfg.hidden_size,)).astype(np.float32)
        sd[b + "k_proj.bias"] = rng.normal(0, 0.01, (cfg.num_key_value_heads * D,)).astype(np.float32)
        sd[b + "v_proj.bias"] = rng.normal(0, 0.01, (cfg.num_key_value_heads * D,)).astype(np.float32)
    params = convert_llama_state_dict(sd, cfg)
    model = L.LlamaForCausalLM(cfg)
    ids = jnp.array([[1, 5, 9]])
    ref = model.init(jax.random.PRNGKey(0), ids)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    logits, _, _ = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()
