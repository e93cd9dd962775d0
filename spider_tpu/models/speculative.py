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


def speculative_generate_ondevice(model: LlamaForCausalLM, params,
                                  input_ids: Sequence[int],
                                  cfg: PromptLookupConfig,
                                  oracle: Optional[Sequence[int]] = None,
                                  corrupt_every: int = 0) -> List[int]:
    """speculative_generate with the ENTIRE propose+verify+commit loop as a
    single jitted ``lax.while_loop`` — two dispatches total (prefill +
    decode) instead of one verify dispatch per window. On hosts where the
    per-dispatch relay overhead rivals the verify forward itself (~30 ms on
    the axon tunnel, bench_details speculative row), the host-driven loop
    LOSES to plain decode; this form removes the dispatch bound entirely.
    Committed stream is byte-identical to speculative_generate (same greedy
    verification; tests/test_llama.py asserts equality vs stepped greedy).

    oracle/corrupt_every: benchmarking instrument for the tok/s-vs-acceptance
    curve. When `oracle` (a token stream, e.g. a previous greedy output of
    the same prompt) is given, drafts come from it instead of the n-gram
    table; `corrupt_every=k` flips every k-th oracle token so acceptance is
    dialed between ~100% (k=0) and ~1/window. Verification is unchanged, so
    the COMMITTED stream is the model's true greedy output for any draft
    source — only the latency moves. bench_suite.bench_speculative_decode
    uses this to report the honest rate curve without real checkpoints.
    """
    ids = [int(t) for t in input_ids]
    T = len(ids)
    N = cfg.max_new_tokens
    G = max(2, cfg.gamma)
    K = max(1, cfg.max_ngram)
    MAXLEN = T + N + G
    eos_arr = jnp.asarray(list(cfg.eos_ids) or [-1], jnp.int32)
    pad_id = jnp.int32(cfg.pad_id)
    cache = init_kv_cache(model.config, 1, T + N + G)

    @jax.jit
    def prefill(params, cache, ids_arr, plen):
        emb = model.apply(params, ids_arr, method=model.embed)
        positions = jnp.arange(ids_arr.shape[1], dtype=jnp.int32)[None]
        logits, _, cache = model.apply(
            params, inputs_embeds=emb, positions=positions,
            kv_write_index=0, kv_cache=cache, kv_len=plen)
        return jnp.argmax(logits[0, -1], -1).astype(jnp.int32), cache

    def propose_dev(buf, L):
        """Device port of propose(): longest-k suffix match, latest
        occurrence, continuation tokens masked to the live prefix."""
        n = G - 1
        drafts, founds = [], []
        for k in range(K, 0, -1):
            pat = jax.lax.dynamic_slice(buf, (jnp.maximum(L - k, 0),), (k,))
            eq = jnp.ones((MAXLEN - k,), bool)
            for j in range(k):
                eq = eq & (buf[j:MAXLEN - k + j] == pat[j])
            # s must leave >= 1 continuation token inside the prefix
            s_idx = jnp.arange(MAXLEN - k, dtype=jnp.int32)
            cand = eq & (s_idx <= L - k - 1)
            s_star = jnp.max(jnp.where(cand, s_idx, -1))
            found = (s_star >= 0) & (L - 1 >= k)
            start = jnp.maximum(s_star, 0) + k
            cont = jax.lax.dynamic_slice(buf, (start,), (n,))
            pos = start + jnp.arange(n, dtype=jnp.int32)
            drafts.append(jnp.where(pos < L, cont, pad_id))
            founds.append(found)
        draft = jnp.full((n,), pad_id, jnp.int32)
        for d, f in zip(reversed(drafts), reversed(founds)):
            draft = jnp.where(f, d, draft)        # longest k wins last
        return draft

    use_oracle = oracle is not None
    if use_oracle:
        orc = jnp.full((MAXLEN,), pad_id, jnp.int32)
        orc = orc.at[:min(len(oracle), MAXLEN)].set(
            jnp.asarray(list(oracle)[:MAXLEN], jnp.int32))
        if corrupt_every:
            idx = jnp.arange(MAXLEN, dtype=jnp.int32)
            orc = jnp.where(idx % corrupt_every == corrupt_every - 1,
                            orc + 1, orc)
    else:
        orc = None

    @jax.jit
    def decode(params, cache, buf, cur):
        def cond(state):
            _, _, _, _, done = state
            return ~done

        def body(state):
            buf, out_len, cur, cache, done = state
            L = T + out_len
            kv_len = T + out_len - 1              # cur's KV still pending
            if use_oracle:
                # out_len tokens are committed; the draft continues the
                # oracle stream AFTER the already-committed position.
                draft = jax.lax.dynamic_slice(orc, (out_len,), (G - 1,))
            else:
                draft = propose_dev(buf, L)
            window = jnp.concatenate([cur[None], draft])[None]     # [1, G]
            emb = model.apply(params, window, method=model.embed)
            positions = kv_len + jnp.arange(G, dtype=jnp.int32)[None]
            logits, _, cache = model.apply(
                params, inputs_embeds=emb, positions=positions,
                kv_write_index=jnp.asarray([kv_len], jnp.int32),
                kv_cache=cache,
                kv_len=jnp.asarray([kv_len + G], jnp.int32))
            preds = jnp.argmax(logits[0], -1).astype(jnp.int32)    # [G]
            is_eos = jnp.any(preds[:, None] == eos_arr[None], -1)  # [G]
            ok = (draft == preds[:-1]) & ~is_eos[:-1]
            c = 1 + jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
            c = jnp.minimum(c, N - out_len)
            buf = jax.lax.dynamic_update_slice(buf, preds, (L,))
            cur = preds[c - 1]
            out_len = out_len + c
            done = (out_len >= N) | jnp.any(cur == eos_arr)
            return buf, out_len, cur, cache, done

        state = (buf, jnp.int32(1), cur, cache,
                 (jnp.int32(1) >= N) | jnp.any(cur == eos_arr))
        buf, out_len, cur, cache, _ = jax.lax.while_loop(cond, body, state)
        return buf, out_len

    cur, cache = prefill(params, cache, jnp.asarray([ids], jnp.int32),
                         jnp.asarray([T], jnp.int32))
    buf = jnp.zeros((MAXLEN,), jnp.int32)
    buf = buf.at[:T].set(jnp.asarray(ids, jnp.int32))
    buf = buf.at[T].set(cur)
    buf, out_len = decode(params, cache, buf, cur)
    out_len = int(out_len)
    return [int(t) for t in np.asarray(buf[T:T + out_len])]
