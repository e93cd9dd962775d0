"""Autoregressive generation: one jitted prefill + lax.scan decode with a
functional KV cache and per-step hidden-state retention.

Replaces the reference's ``llama_model.generate(..., StoppingCriteria,
output_hidden_states=True, return_dict_in_generate=True)`` hot loop
(/root/reference/spider/models/spider.py:1491-1508) — including the part the
reference does in Python: accumulating each step's hidden states so the
signal-token taps (spider.py:1413-1463) can slice them afterwards. Here the
accumulation happens inside the scan at configured layers only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_kv_cache
from spider_tpu.ops.sampling import greedy, sample_top_p


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0          # 0 => greedy
    top_p: float = 1.0
    eos_ids: Tuple[int, ...] = ()     # stop tokens ([END], eos)
    pad_id: int = 0
    collect_layers: Tuple[int, ...] = (-1,)  # hidden-state layers to retain


def generate(model: LlamaForCausalLM, params, inputs_embeds: jnp.ndarray,
             prompt_len: jnp.ndarray, gen_cfg: GenerateConfig,
             rng: Optional[jax.Array] = None,
             embed_fn=None):
    """Generate tokens from (right-padded) prompt embeddings.

    Args:
      inputs_embeds: [B, T_prompt, H] prompt embeddings (multimodal splicing
        already applied).
      prompt_len: [B] true prompt lengths (<= T_prompt).
      embed_fn: token-id -> embedding function; defaults to the model's
        embedding table.
    Returns dict with tokens [B, N], hidden [N, K, B, H] (K = collected
    layers), done mask, and lengths.
    """
    cfg: LlamaConfig = model.config
    B, T_prompt, _ = inputs_embeds.shape
    N = gen_cfg.max_new_tokens
    max_len = T_prompt + N

    if embed_fn is None:
        embed_fn = lambda ids: model.apply(params, ids, method=model.embed)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = init_kv_cache(cfg, B, max_len)

    # ---- prefill -------------------------------------------------------------
    positions = jnp.arange(T_prompt, dtype=jnp.int32)[None, :]
    # Cache is zero-padded beyond each sample's prompt; kv_len masks it off.
    logits, hidden, cache = model.apply(
        params, inputs_embeds=inputs_embeds, positions=positions,
        kv_write_index=0, kv_cache=cache, kv_len=prompt_len,
        output_hidden_states=True)

    # Last *real* prompt token's logits decide the first generated token.
    last_idx = jnp.maximum(prompt_len - 1, 0)  # [B]
    last_logits = jnp.take_along_axis(
        logits, last_idx[:, None, None], axis=1)[:, 0]  # [B, V]

    collect = tuple(gen_cfg.collect_layers)
    eos = jnp.asarray(gen_cfg.eos_ids, dtype=jnp.int32) if gen_cfg.eos_ids else None

    def sample(logits, key):
        if gen_cfg.temperature <= 0.0:
            return greedy(logits)
        return sample_top_p(logits, key, temperature=gen_cfg.temperature,
                            top_p=gen_cfg.top_p)

    rng, key0 = jax.random.split(rng)
    tok0 = sample(last_logits, key0)
    done0 = jnp.zeros((B,), dtype=bool)
    if eos is not None:
        done0 = jnp.any(tok0[:, None] == eos[None, :], axis=-1)

    def step(carry, key):
        cache, tok, kv_len, done = carry
        emb = embed_fn(tok[:, None])                       # [B, 1, H]
        positions = kv_len[:, None]
        logits, hidden, cache = model.apply(
            params, inputs_embeds=emb, positions=positions,
            kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1,
            output_hidden_states=True)
        step_hidden = jnp.stack(
            [hidden[i][:, 0] for i in collect], axis=0)     # [K, B, H]
        nxt = sample(logits[:, -1], key)
        nxt = jnp.where(done, gen_cfg.pad_id, nxt)
        new_done = done
        if eos is not None:
            new_done = done | jnp.any(nxt[:, None] == eos[None, :], axis=-1)
        out_tok = jnp.where(done, gen_cfg.pad_id, nxt)
        kv_len = kv_len + jnp.where(done, 0, 1).astype(kv_len.dtype)
        return (cache, nxt, kv_len, new_done), (out_tok, step_hidden)

    keys = jax.random.split(rng, max(N - 1, 1))[: max(N - 1, 0)]
    (cache, _, kv_len, done), (toks, step_hiddens) = jax.lax.scan(
        step, (cache, tok0, prompt_len, done0), keys, length=max(N - 1, 0))

    # Alignment convention: step_hidden[i] is the hidden state computed AT the
    # position of tokens[:, i] (its embedding was the step input), so tapping
    # signal tokens means gathering step_hidden where tokens == [Xi]. The very
    # last token gets no hidden state (it is never fed back) — it is [END] or
    # budget-truncated in practice.
    tokens = jnp.concatenate([tok0[:, None], jnp.moveaxis(toks, 0, 1)], axis=1)
    return dict(tokens=tokens, step_hidden=step_hiddens, done=done,
                kv_len=kv_len, cache=cache)


def make_generate_fn(model: LlamaForCausalLM, gen_cfg: GenerateConfig):
    """jit-compiled generate closed over static model/config."""

    @functools.partial(jax.jit, donate_argnums=())
    def fn(params, inputs_embeds, prompt_len, rng):
        return generate(model, params, inputs_embeds, prompt_len, gen_cfg, rng)

    return fn


def stream_generate(model: LlamaForCausalLM, params,
                    inputs_embeds: jnp.ndarray, prompt_len: jnp.ndarray,
                    gen_cfg: GenerateConfig,
                    rng: Optional[jax.Array] = None):
    """Token-streaming decode: yields one int token id per step (batch 1) —
    the chat-UX path (per-token streaming like the reference's web demos).
    Prefill and the single-token step are each jitted once; the Python loop
    only syncs one scalar per token."""
    cfg = model.config
    B, T_prompt, _ = inputs_embeds.shape
    assert B == 1, "streaming is a batch-1 chat path"
    N = gen_cfg.max_new_tokens
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cache = init_kv_cache(cfg, B, T_prompt + N)

    @jax.jit
    def prefill(params, embeds, plen, cache):
        positions = jnp.arange(embeds.shape[1], dtype=jnp.int32)[None, :]
        logits, _, cache = model.apply(
            params, inputs_embeds=embeds, positions=positions,
            kv_write_index=0, kv_cache=cache, kv_len=plen)
        last = jnp.take_along_axis(
            logits, jnp.maximum(plen - 1, 0)[:, None, None], axis=1)[:, 0]
        return last, cache

    @jax.jit
    def step(params, tok, kv_len, cache, key):
        emb = model.apply(params, tok[:, None], method=model.embed)
        logits, _, cache = model.apply(
            params, inputs_embeds=emb, positions=kv_len[:, None],
            kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1)
        if gen_cfg.temperature <= 0.0:
            nxt = greedy(logits[:, -1])
        else:
            nxt = sample_top_p(logits[:, -1], key,
                               temperature=gen_cfg.temperature,
                               top_p=gen_cfg.top_p)
        return nxt, cache

    logits, cache = prefill(params, inputs_embeds, prompt_len, cache)
    key = rng
    if gen_cfg.temperature <= 0.0:
        tok = greedy(logits)
    else:
        key, sub = jax.random.split(key)
        tok = sample_top_p(logits, sub, temperature=gen_cfg.temperature,
                           top_p=gen_cfg.top_p)
    kv_len = prompt_len
    eos = set(gen_cfg.eos_ids)
    for i in range(N):
        t = int(tok[0])
        yield t
        if t in eos:
            return
        key, sub = jax.random.split(key)
        tok, cache = step(params, tok, kv_len, cache, sub)
        kv_len = kv_len + 1
