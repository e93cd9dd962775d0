"""Prompt-lookup speculative decoding — multi-token bs=1 greedy decode.

The bs=1 decode rate on this host is capped by the ~30 ms/dispatch axon
relay overhead plus one HBM weight sweep per token. Draft-model-free
speculation (prompt lookup / n-gram continuation, cf. transformers'
prompt_lookup_num_tokens) proposes the tokens that FOLLOWED the last
occurrence of the current suffix n-gram, then verifies the whole window
in ONE forward: every accepted token removes a full dispatch + weight
sweep. For greedy decoding the committed stream is exactly the standard
greedy output — verification compares the model's own argmax at every
position (speculation changes latency, never results).

Spider's tagged answers are unusually speculation-friendly: captions are
echoed from the prompt into ``<IMAGE>...</IMAGE>`` spans
(/root/reference/spider/models/spider_decoder.py:283-306 tag grammar), so
suffix n-grams frequently re-occur.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.llama import LlamaForCausalLM, init_kv_cache


@dataclasses.dataclass(frozen=True)
class PromptLookupConfig:
    max_new_tokens: int = 512
    gamma: int = 8                 # verify window (1 carry + gamma-1 draft)
    max_ngram: int = 3             # longest suffix n-gram to match
    eos_ids: Tuple[int, ...] = ()
    pad_id: int = 0


def propose(seq: List[int], n: int, max_ngram: int, pad_id: int) -> List[int]:
    """Tokens that followed the most recent earlier occurrence of the
    current suffix n-gram (longest n first); pad_id-filled if no match."""
    L = len(seq)
    for k in range(min(max_ngram, L - 1), 0, -1):
        pat = seq[L - k:]
        for s in range(L - k - 1, -1, -1):
            if seq[s:s + k] == pat:
                cont = seq[s + k:s + k + n]
                if cont:
                    return cont + [pad_id] * (n - len(cont))
    return [pad_id] * n


def speculative_generate(model: LlamaForCausalLM, params,
                         input_ids: Sequence[int],
                         cfg: PromptLookupConfig) -> List[int]:
    """Greedy decode with prompt-lookup speculation (batch 1).

    Returns the generated token ids (eos included if hit) — byte-identical
    to the step-by-step greedy stream."""
    ids = [int(t) for t in input_ids]
    T = len(ids)
    N = cfg.max_new_tokens
    G = max(2, cfg.gamma)
    cache = init_kv_cache(model.config, 1, T + N + G)

    @jax.jit
    def prefill(params, cache, ids_arr, plen):
        emb = model.apply(params, ids_arr, method=model.embed)
        positions = jnp.arange(ids_arr.shape[1], dtype=jnp.int32)[None]
        logits, _, cache = model.apply(
            params, inputs_embeds=emb, positions=positions,
            kv_write_index=0, kv_cache=cache, kv_len=plen)
        return jnp.argmax(logits[0, -1], -1), cache

    @jax.jit
    def verify(params, cache, kv_len, window):
        """window [1, G] token ids starting at position kv_len; returns the
        model's argmax continuation AFTER each window position [G]."""
        emb = model.apply(params, window, method=model.embed)
        positions = kv_len[:, None] + jnp.arange(G, dtype=jnp.int32)[None]
        logits, _, cache = model.apply(
            params, inputs_embeds=emb, positions=positions,
            kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + G)
        return jnp.argmax(logits[0], -1).astype(jnp.int32), cache

    cur, cache = prefill(params, cache,
                         jnp.asarray([ids], jnp.int32),
                         jnp.asarray([T], jnp.int32))
    cur = int(cur)
    out: List[int] = [cur]
    eos = set(cfg.eos_ids)
    kv_len = T
    while len(out) < N and cur not in eos:
        draft = propose(ids + out, G - 1, cfg.max_ngram, cfg.pad_id)
        window = jnp.asarray([[cur] + draft], jnp.int32)
        preds, cache = verify(params, cache,
                              jnp.asarray([kv_len], jnp.int32), window)
        preds = np.asarray(preds)
        # Commit preds[0]; keep walking while the draft guessed right.
        committed = 0
        for i in range(G):
            t = int(preds[i])
            out.append(t)
            committed += 1          # window[i] is now a validated position
            if len(out) >= N or t in eos:
                break
            if i + 1 >= G or draft[i] != t:
                break
        # Cache validity: positions kv_len .. kv_len+committed-1 hold the
        # KV of [cur] + accepted draft tokens; the rest will be rewritten.
        kv_len += committed
        cur = out[-1]
    return out[:N]
