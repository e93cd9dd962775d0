"""TPU-native Llama-family decoder (flax.linen).

Covers the roles of the reference's vendored HF Llama copies
(/root/reference/spider/models/modeling_llama.py:599,
 modeling_llama3.py — kept so hidden states/labels behave identically):
  * per-layer hidden-state outputs (``output_hidden_states``) for the
    signal-token alignment taps (cf. spider.py:1078-1147)
  * extendable vocabulary (signal tokens resize embeddings; new rows trainable,
    original rows freezable via an update mask — see parallel/partition.py)
  * additive LoRA on configurable projections (peft analogue,
    cf. base_model.py:58-71)
  * functional KV cache for autoregressive decode.

Architecture decisions are TPU-first: layers run under ``nn.scan`` (one
compiled block, stacked params — fast compiles, natural remat boundary),
attention is the Pallas flash kernel for prefill and an XLA einsum for
single-token decode, all matmuls in bf16 with fp32 softmax/norms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.ops.attention import flash_attention, mha_reference
from spider_tpu.ops.norms import rms_norm
from spider_tpu.ops.rope import apply_rope, rope_inv_freq


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 0                      # 0 disables LoRA
    alpha: float = 21.0
    dropout: float = 0.0
    targets: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, float]] = None
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    lora: LoraConfig = dataclasses.field(default_factory=LoraConfig)
    remat: bool = False
    # 'int8' = weight-only per-output-channel quantization of all projection
    # matrices (embeddings/norms stay high precision). Serving-oriented: an
    # 8B model fits a single 16-GB v5e chip and decode (HBM-bound) reads
    # half the bytes.
    quantization: Optional[str] = None
    # Qwen2-family: bias on q/k/v projections (o/mlp stay bias-free).
    attention_bias: bool = False
    # Qwen2-VL / Qwen2.5-Omni multimodal 3-D RoPE: per-frequency split of
    # head_dim/2 across (temporal, height, width) position streams. When set,
    # `positions` may be [3, B, T]; plain [B, T] positions are broadcast to
    # all three streams (exactly standard RoPE for text).
    mrope_section: Optional[Tuple[int, ...]] = None
    # Context parallelism: shard the sequence over this mesh axis and run
    # ring attention for the (cache-free) training forward. Set via
    # `with_context_parallel(mesh)`.
    context_mesh: Optional[Any] = None
    context_axis: str = "context"
    # Mixture-of-experts FFN (torchscale-parity, SURVEY.md §2.2): >0 replaces
    # every MLP with num_experts capacity-gated experts; shard the expert dim
    # over the `expert` mesh axis via the partition rules for EP.
    num_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 2.0
    moe_aux_weight: float = 0.01

    def with_context_parallel(self, mesh, axis: str = "context"):
        return dataclasses.replace(self, context_mesh=mesh, context_axis=axis)

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def extend_vocab(self, new_vocab_size: int) -> "LlamaConfig":
        return dataclasses.replace(self, vocab_size=new_vocab_size)


# Presets ---------------------------------------------------------------------

def llama2_7b() -> LlamaConfig:
    return LlamaConfig()


def llama3_8b() -> LlamaConfig:
    """DeepSeek-R1-Distill-Llama-8B shares this architecture."""
    return LlamaConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        max_position_embeddings=131072,
        rope_theta=500000.0,
        rope_scaling=dict(factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
    )


def qwen2_7b() -> LlamaConfig:
    """Qwen2/2.5-7B family (the Qwen2.5-Omni thinker's text decoder shares
    this shape)."""
    return LlamaConfig(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_hidden_layers=28,
        num_attention_heads=28,
        num_key_value_heads=4,
        max_position_embeddings=32768,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        attention_bias=True,
    )


def llama_tiny(vocab_size: int = 512, lora_r: int = 0) -> LlamaConfig:
    """Small random-init config for CPU tests."""
    return LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        dtype=jnp.float32,
        lora=LoraConfig(r=lora_r),
    )


# Modules ---------------------------------------------------------------------


class LoraDense(nn.Module):
    """Dense layer with optional additive LoRA branch: y = xW + (α/r)·xAB.

    quantization='int8' stores the kernel as int8 + per-output-channel fp32
    scale; the int8->compute-dtype convert fuses into the matmul so HBM
    traffic is halved vs bf16 (the decode bottleneck).

    quantization='int4' packs TWO 4-bit weights per int8 byte in a
    split-half layout: byte (i, f) holds W[i, f] in its low nibble and
    W[i + in/2, f] in its high nibble, so unpacking is two sign-extending
    shifts and the matmul becomes two half-K dots — no lane interleave
    (which TPU relayouts make expensive) is ever needed. Weight HBM
    traffic per decoded token is 1/4 of bf16. NOTE: native jnp.int4 params
    are deliberately avoided — S4 jit arguments crash the axon relay
    backend (RecursionError in dispatch, verified 2026-08-16)."""

    features: int
    use_bias: bool = False
    lora_r: int = 0
    lora_alpha: float = 21.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.quantization == "int8":
            kernel_q = self.param(
                "kernel_q",
                lambda key, shape: jax.random.randint(key, shape, -127, 128,
                                                      jnp.int8),
                (in_features, self.features))
            scale = self.param("kernel_scale", nn.initializers.constant(0.01),
                               (self.features,), jnp.float32)
            # Per-output-channel scale applied to the matmul OUTPUT: the
            # int8->bf16 convert fuses into the matmul operand read and no
            # dequantized [in, out] temporary can exist.
            y = jnp.dot(x, kernel_q.astype(self.dtype)) \
                * scale.astype(self.dtype)[None, :]
        elif self.quantization == "int4":
            assert in_features % 2 == 0, in_features
            half = in_features // 2
            packed = self.param(
                "kernel_q",
                lambda key, shape: jax.random.randint(key, shape, -128, 128,
                                                      jnp.int8),
                (half, self.features))
            scale = self.param("kernel_scale", nn.initializers.constant(0.01),
                               (self.features,), jnp.float32)
            from spider_tpu.ops.quant import int4_matmul, int4_matmul_reference
            if jax.default_backend() == "tpu":
                y = int4_matmul(x, packed, scale, out_dtype=self.dtype)
            else:
                y = int4_matmul_reference(x, packed, scale,
                                          out_dtype=self.dtype)
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (in_features, self.features), self.param_dtype)
            y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.lora_r > 0:
            lora_a = self.param(
                "lora_a", nn.initializers.normal(stddev=0.02),
                (in_features, self.lora_r), self.param_dtype)
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (self.lora_r, self.features),
                self.param_dtype)
            scale = self.lora_alpha / self.lora_r
            y = y + scale * jnp.dot(
                jnp.dot(x, lora_a.astype(self.dtype)), lora_b.astype(self.dtype))
        return y


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, kv_write_index, kv_cache=None, kv_len=None,
                 page_table=None):
        cfg = self.config
        D = cfg.head_dim_
        Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        lora = cfg.lora

        def proj(name, features, use_bias=False):
            r = lora.r if name in lora.targets else 0
            return LoraDense(features, use_bias=use_bias, lora_r=r,
                             lora_alpha=lora.alpha,
                             dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             quantization=cfg.quantization,
                             name=name)

        B, T, _ = x.shape
        qkv_bias = cfg.attention_bias
        q = proj("q_proj", Hq * D, qkv_bias)(x).reshape(B, T, Hq, D)
        k = proj("k_proj", Hkv * D, qkv_bias)(x).reshape(B, T, Hkv, D)
        v = proj("v_proj", Hkv * D, qkv_bias)(x).reshape(B, T, Hkv, D)

        inv_freq = rope_inv_freq(D, cfg.rope_theta, cfg.rope_scaling)
        if cfg.mrope_section is not None and jnp.ndim(positions) == 3:
            from spider_tpu.ops.rope import apply_mrope

            q = apply_mrope(q, positions, inv_freq, cfg.mrope_section)
            k = apply_mrope(k, positions, inv_freq, cfg.mrope_section)
        else:
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)

        new_cache = None
        if kv_cache is not None and page_table is not None:
            # Block-paged KV cache (serving): per-layer pools
            # [N_blocks, page, Hkv, D]; page_table [B, max_pages] maps each
            # slot's logical pages to pool blocks so heterogeneous lengths
            # share one pool instead of each pinning max_len
            # (cf. the reference's DeepSpeed inference cache — contiguous
            # per sequence; paging is the TPU-serving upgrade).
            assert T == 1, "paged path is single-token decode"
            pool_k, pool_v = kv_cache
            page = pool_k.shape[1]
            pages = jnp.take_along_axis(
                page_table, (kv_write_index // page)[:, None], axis=1)[:, 0]
            offs = kv_write_index % page
            pool_k = pool_k.at[pages, offs].set(k[:, 0].astype(pool_k.dtype))
            pool_v = pool_v.at[pages, offs].set(v[:, 0].astype(pool_v.dtype))
            new_cache = (pool_k, pool_v)
            if jax.default_backend() == "tpu" and D % 128 == 0 \
                    and page % 8 == 0:
                # Pallas kernel walks the page table with scalar prefetch —
                # pages are read in place instead of gather-copying every
                # slot's whole window per step (ops/paged_attention.py).
                from spider_tpu.ops.paged_attention import \
                    paged_decode_attention

                out = paged_decode_attention(
                    q[:, 0], pool_k, pool_v, page_table, kv_len)[:, None]
            else:
                gk = pool_k[page_table]   # [B, max_pages, page, Hkv, D]
                gv = pool_v[page_table]
                Bp, MP, _, _, _ = gk.shape
                gk = gk.reshape(Bp, MP * page, Hkv, D)
                gv = gv.reshape(Bp, MP * page, Hkv, D)
                out = mha_reference(q, gk.astype(q.dtype),
                                    gv.astype(q.dtype),
                                    causal=False, kv_len=kv_len)
            out = out.reshape(B, T, Hq * D)
            return proj("o_proj", cfg.hidden_size)(out), new_cache
        if kv_cache is not None:
            ck, cv = kv_cache  # [B, S_max, Hkv, D]
            if jnp.ndim(kv_write_index) == 0:
                ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                                  (0, kv_write_index, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                                  (0, kv_write_index, 0, 0))
            else:
                # Per-sample write positions (right-padded batch decode).
                def write_one(c, n, i):
                    return jax.lax.dynamic_update_slice(c, n.astype(c.dtype),
                                                        (i, 0, 0))

                ck = jax.vmap(write_one)(ck, k, kv_write_index)
                cv = jax.vmap(write_one)(cv, v, kv_write_index)
            new_cache = (ck, cv)
            if T == 1:
                # Single-token decode: XLA einsum over the cache (HBM-bound).
                out = mha_reference(q, ck.astype(q.dtype), cv.astype(q.dtype),
                                    causal=False, kv_len=kv_len)
            else:
                out = flash_attention(q, ck.astype(q.dtype), cv.astype(q.dtype),
                                      causal=True, kv_len=kv_len,
                                      q_offset=kv_write_index)
        elif cfg.context_mesh is not None:
            # Context-parallel training forward: exact ring attention over
            # the sequence axis (SURVEY.md §2.3 SP/CP row).
            from spider_tpu.ops.ring_attention import ring_attention

            out = ring_attention(q, k, v, cfg.context_mesh,
                                 axis=cfg.context_axis, causal=True)
        else:
            out = flash_attention(q, k, v, causal=True)

        out = out.reshape(B, T, Hq * D)
        out = proj("o_proj", cfg.hidden_size)(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        lora = cfg.lora

        def proj(name, features):
            r = lora.r if name in lora.targets else 0
            return LoraDense(features, lora_r=r, lora_alpha=lora.alpha,
                             dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             quantization=cfg.quantization,
                             name=name)

        gate = proj("gate_proj", cfg.intermediate_size)(x)
        up = proj("up_proj", cfg.intermediate_size)(x)
        return proj("down_proj", cfg.hidden_size)(nn.silu(gate) * up)


class LlamaMoEMLP(nn.Module):
    """Capacity-gated MoE FFN (torchscale xmoe analogue inside the LLM).
    Expert weights carry a leading E axis sharded over `expert` by the
    partition rules; the dispatch einsums propagate that sharding (EP)."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        from spider_tpu.parallel.moe import MoEConfig, moe_ffn_local

        B, T, H = x.shape
        params = {
            "wg": self.param("wg", nn.initializers.normal(0.02),
                             (H, cfg.num_experts), jnp.float32),
            "w1": self.param("w1", nn.initializers.lecun_normal(),
                             (cfg.num_experts, H, cfg.intermediate_size),
                             cfg.param_dtype).astype(cfg.dtype),
            "w2": self.param("w2", nn.initializers.lecun_normal(),
                             (cfg.num_experts, cfg.intermediate_size, H),
                             cfg.param_dtype).astype(cfg.dtype),
        }
        mcfg = MoEConfig(num_experts=cfg.num_experts, d_model=H,
                         d_ff=cfg.intermediate_size,
                         capacity_factor=cfg.moe_capacity_factor,
                         top_k=cfg.moe_top_k, dtype=cfg.dtype)
        out, aux = moe_ffn_local(params, x.reshape(B * T, H), mcfg)
        self.sow("losses", "moe_aux", aux)
        return out.reshape(B, T, H)


class LlamaBlock(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, kv_write_index, kv_cache=None, kv_len=None,
                 page_table=None):
        cfg = self.config
        w1 = self.param("input_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,), cfg.param_dtype)
        attn_out, new_cache = LlamaAttention(cfg, name="self_attn")(
            rms_norm(x, w1, cfg.rms_norm_eps), positions, kv_write_index,
            kv_cache, kv_len, page_table)
        x = x + attn_out
        w2 = self.param("post_attention_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,), cfg.param_dtype)
        mlp_cls = LlamaMoEMLP if cfg.num_experts > 0 else LlamaMLP
        x = x + mlp_cls(cfg, name="mlp")(rms_norm(x, w2, cfg.rms_norm_eps))
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder stack under nn.scan: params stacked on a leading layer axis."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, inputs_embeds, positions, kv_write_index=0,
                 kv_cache=None, kv_len=None, output_hidden_states=False,
                 page_table=None):
        cfg = self.config

        block_cls = LlamaBlock
        if cfg.remat:
            block_cls = nn.remat(LlamaBlock, static_argnums=())

        def body(block, x, positions, kv_write_index, layer_cache, kv_len,
                 page_table):
            out, new_cache = block(x, positions, kv_write_index,
                                   layer_cache, kv_len, page_table)
            return out, (out, new_cache)

        scan = nn.scan(
            body,
            variable_axes={"params": 0, "losses": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, 0, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
            length=cfg.num_hidden_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        x = inputs_embeds.astype(cfg.dtype)
        x, (layer_outputs, new_cache) = scan(
            block_cls(cfg, name="layers"), x, positions, kv_write_index,
            kv_cache, kv_len, page_table)

        norm_w = self.param("norm", nn.initializers.ones, (cfg.hidden_size,),
                            cfg.param_dtype)
        final = rms_norm(x, norm_w, cfg.rms_norm_eps)

        hidden_states = None
        if output_hidden_states:
            # HF convention: [embeds, layer_1..layer_{N-1} outputs, final norm]
            # so hidden_states[-1] is the post-final-norm state
            # (cf. modeling_llama.py — Spider's alignment_layer=[-1] taps this).
            pre = jnp.concatenate(
                [inputs_embeds.astype(cfg.dtype)[None],
                 layer_outputs[:-1]], axis=0)
            hidden_states = jnp.concatenate([pre, final[None]], axis=0)
        return final, hidden_states, new_cache


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="embed_tokens")
        self.model = LlamaModel(cfg, name="model")
        if not cfg.tie_word_embeddings:
            # lm_head reads ~1 GB/token at 128k vocab in bf16 — quantize it
            # along with the projections when serving int8.
            self.lm_head = LoraDense(
                cfg.vocab_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                quantization=cfg.quantization, name="lm_head")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.config.tie_word_embeddings:
            return self.embed_tokens.attend(hidden.astype(self.config.dtype))
        return self.lm_head(hidden)

    def call_with_final(self, inputs_embeds, positions=None, kv_write_index=0,
                        kv_cache=None, kv_len=None):
        """(logits, final_hidden, new_kv_cache) — final_hidden is the
        post-final-norm last layer [B, T, H] (== HF hidden_states[-1])
        without stacking every layer. The Qwen2.5-Omni talker consumes
        these rows (+ token embeds) as its thinker stream."""
        B, T = inputs_embeds.shape[:2]
        if positions is None:
            positions = jnp.arange(T, dtype=jnp.int32)[None, :] + kv_write_index
        final, _, new_cache = self.model(
            inputs_embeds, positions, kv_write_index, kv_cache, kv_len)
        return self.logits(final), final, new_cache

    def __call__(self, input_ids=None, inputs_embeds=None, positions=None,
                 kv_write_index=0, kv_cache=None, kv_len=None,
                 output_hidden_states=False, page_table=None):
        """Returns (logits, hidden_states | None, new_kv_cache | None).

        hidden_states: [L+1, B, T, H] stacked (embeds, layers 1..N-1, final
        norm) matching HF's output_hidden_states tuple indexing.

        page_table [B, max_pages]: block-paged decode — kv_cache becomes
        (pool_k, pool_v) [L, N_blocks, page, Hkv, D] (see init_paged_kv_cache).
        """
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        B, T = inputs_embeds.shape[:2]
        if positions is None:
            positions = jnp.arange(T, dtype=jnp.int32)[None, :] + kv_write_index
        final, hidden_states, new_cache = self.model(
            inputs_embeds, positions, kv_write_index, kv_cache, kv_len,
            output_hidden_states, page_table)
        logits = self.logits(final)
        return logits, hidden_states, new_cache


def init_kv_cache(cfg: LlamaConfig, batch_size: int, max_len: int,
                  dtype=None):
    """Per-layer stacked KV cache matching the scanned param layout:
    (k, v) each [L, B, max_len, Hkv, D]."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_hidden_layers, batch_size, max_len,
             cfg.num_key_value_heads, cfg.head_dim_)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_paged_kv_cache(cfg: LlamaConfig, num_blocks: int, page: int = 128,
                        dtype=None):
    """Block-paged KV pool: (k, v) each [L, num_blocks, page, Hkv, D].
    Slots map logical pages to pool blocks through a host-managed page
    table (serving/continuous.py PagedContinuousBatcher)."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_hidden_layers, num_blocks, page,
             cfg.num_key_value_heads, cfg.head_dim_)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = -100) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shifted LM loss + token accuracy (cf. spider.py:1000-1002,1338-1348).

    logits [B, T, V]; labels [B, T] with ignore_index outside answer spans.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1)
    loss = jnp.where(mask, nll, 0.0).sum() / denom
    preds = jnp.argmax(logits, axis=-1)
    acc = (jnp.where(mask, preds == safe_targets, False).sum() / denom)
    return loss, acc
