"""Continuous batching LLM server: a fixed pool of KV-cache slots decodes one
token per tick for every active request; new requests prefill into free slots
and join the next tick without disturbing in-flight ones (token-level
joining — the upgrade over the wave batcher in serving/batcher.py).

Decode is HBM-bound on weights, so keeping the slot pool busy multiplies
tokens/s/chip (bench_suite: 87 -> 335 tok/s at 8 concurrent).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_kv_cache
from spider_tpu.ops.sampling import greedy


@dataclasses.dataclass
class _Request:
    ids: List[int]
    future: Future
    slot: int = -1
    emitted: List[int] = dataclasses.field(default_factory=list)


class ContinuousBatcher:
    def __init__(self, model: LlamaForCausalLM, params, tokenizer,
                 num_slots: int = 8, max_len: int = 1024,
                 max_new_tokens: int = 128, prefill_bucket: int = 128):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.S = num_slots
        self.max_len = max_len
        self.max_new_tokens = max_new_tokens
        self.prefill_bucket = prefill_bucket
        cfg = model.config

        # persistent device state
        self.cache = init_kv_cache(cfg, num_slots, max_len)
        self.kv_len = jnp.zeros((num_slots,), jnp.int32)
        self.last_tok = jnp.zeros((num_slots,), jnp.int32)
        self.active = np.zeros((num_slots,), bool)       # host-side
        self.budget = np.zeros((num_slots,), np.int64)

        self._requests: Dict[int, _Request] = {}
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = False

        pad = tokenizer.pad_token_id

        @jax.jit
        def decode_step(params, cache, kv_len, last_tok, active_mask):
            emb = model.apply(params, last_tok[:, None], method=model.embed)
            logits, _, cache = model.apply(
                params, inputs_embeds=emb, positions=kv_len[:, None],
                kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1)
            nxt = greedy(logits[:, -1])
            nxt = jnp.where(active_mask, nxt, pad)
            kv_len = kv_len + active_mask.astype(kv_len.dtype)
            return cache, kv_len, nxt

        self._decode_step = decode_step
        self._prefill_cache: Dict[int, callable] = {}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API
    def submit(self, prompt: str) -> Future:
        ids = list(self.tokenizer(prompt, add_special_tokens=True).input_ids)
        fut: Future = Future()
        self._queue.put(_Request(ids=ids, future=fut))
        return fut

    def chat(self, prompt: str, timeout: float = 600.0) -> str:
        return self.submit(prompt).result(timeout)

    def close(self):
        self._stop = True
        self._thread.join(timeout=5)

    # -------------------------------------------------------------- prefill
    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_cache:
            model = self.model
            cfg: LlamaConfig = model.config

            @jax.jit
            def prefill(params, ids, plen):
                small = init_kv_cache(cfg, 1, bucket)
                emb = model.apply(params, ids, method=model.embed)
                positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
                logits, _, small = model.apply(
                    params, inputs_embeds=emb, positions=positions,
                    kv_write_index=0, kv_cache=small, kv_len=plen)
                last = jnp.take_along_axis(
                    logits, jnp.maximum(plen - 1, 0)[:, None, None],
                    axis=1)[:, 0]
                return small, greedy(last)

            self._prefill_cache[bucket] = prefill
        return self._prefill_cache[bucket]

    def _admit(self, req: _Request, slot: int):
        ids = req.ids[: self.max_len - self.max_new_tokens]
        bucket = ((len(ids) + self.prefill_bucket - 1)
                  // self.prefill_bucket) * self.prefill_bucket
        arr = np.full((1, bucket), self.tokenizer.pad_token_id, np.int64)
        arr[0, : len(ids)] = ids
        small, tok0 = self._prefill_fn(bucket)(
            self.params, jnp.asarray(arr),
            jnp.asarray([len(ids)], jnp.int32))
        # splice the prefilled KV rows into this slot
        ck, cv = self.cache
        sk, sv = small
        ck = jax.lax.dynamic_update_slice(
            ck, sk.astype(ck.dtype), (0, slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, sv.astype(cv.dtype), (0, slot, 0, 0, 0))
        self.cache = (ck, cv)
        self.kv_len = self.kv_len.at[slot].set(len(ids))
        self.last_tok = self.last_tok.at[slot].set(int(tok0[0]))
        self.active[slot] = True
        self.budget[slot] = self.max_new_tokens - 1  # tok0 already emitted
        req.slot = slot
        req.emitted = [int(tok0[0])]
        self._requests[slot] = req

    def _finish(self, slot: int):
        req = self._requests.pop(slot)
        self.active[slot] = False
        text = self.tokenizer.decode(
            [t for t in req.emitted if t != self.tokenizer.pad_token_id],
            skip_special_tokens=True)
        req.future.set_result(text)

    # ----------------------------------------------------------------- loop
    def _loop(self):
        eos = self.tokenizer.eos_token_id
        while not self._stop:
            # admit new requests into free slots
            while not all(self.active):
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                slot = int(np.argmin(self.active))
                self._admit(req, slot)
            if not self.active.any():
                try:
                    req = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                self._admit(req, int(np.argmin(self.active)))
            # check finishes BEFORE stepping (first token may already be eos)
            for slot in np.where(self.active)[0]:
                req = self._requests[slot]
                if req.emitted and (req.emitted[-1] == eos
                                    or self.budget[slot] <= 0):
                    self._finish(slot)
            if not self.active.any():
                continue
            mask = jnp.asarray(self.active)
            self.cache, self.kv_len, nxt = self._decode_step(
                self.params, self.cache, self.kv_len, self.last_tok, mask)
            self.last_tok = nxt
            toks = np.asarray(nxt)
            for slot in np.where(self.active)[0]:
                self._requests[slot].emitted.append(int(toks[slot]))
                self.budget[slot] -= 1
