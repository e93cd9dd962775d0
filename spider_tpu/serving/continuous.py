"""Continuous batching LLM server: a fixed pool of KV-cache slots decodes one
token per tick for every active request; new requests prefill into free slots
and join the next tick without disturbing in-flight ones (token-level
joining — the upgrade over the wave batcher in serving/batcher.py).

Decode is HBM-bound on weights, so keeping the slot pool busy multiplies
tokens/s/chip (bench_suite: 87 -> 335 tok/s at 8 concurrent).

Admission is ASYNC (prefill/decode overlap): `_admit` dispatches the
prefill + KV splice and records the first token as an unresolved device
array — no host sync. The decode chunk for the already-running slots is
dispatched right behind it, so through the ~30 ms/dispatch axon relay the
device runs prefill -> decode back-to-back while the host never blocks
until the tick's single chunk sync, where pending first tokens resolve in
one batched device_get (before the chunk tokens, preserving stream order
and greedy parity — tests/test_serving.py parity cases cover admission
ticks). Page growth planning reads a host mirror of kv_len so `_pre_step`
cannot force an early sync.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

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
    # number of emitted tokens already folded into `ids` by preemption —
    # keeps a twice-preempted request from double-counting its history
    n_consumed: int = 0


class ContinuousBatcher:
    def __init__(self, model: LlamaForCausalLM, params, tokenizer,
                 num_slots: int = 8, max_len: int = 1024,
                 max_new_tokens: int = 128, prefill_bucket: int = 128,
                 decode_steps: int = 8):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.S = num_slots
        self.max_len = max_len
        self.max_new_tokens = max_new_tokens
        self.prefill_bucket = prefill_bucket
        # tokens decoded per device dispatch (a lax.scan inside one jit):
        # host dispatch through the axon relay costs ~30 ms/tick, which caps
        # one-token-per-tick serving at ~124 tok/s/chip regardless of
        # occupancy; an 8-step on-device chunk amortizes it 8x. Requests
        # join/finish at chunk boundaries (over-decoded tokens past eos or
        # budget are discarded host-side, preserving greedy parity).
        self.decode_steps = decode_steps
        cfg = model.config

        # persistent device state
        self.cache = self._make_cache(cfg, num_slots, max_len)
        self.kv_len = jnp.zeros((num_slots,), jnp.int32)
        self.last_tok = jnp.zeros((num_slots,), jnp.int32)
        self.active = np.zeros((num_slots,), bool)       # host-side
        self.budget = np.zeros((num_slots,), np.int64)
        # host mirror of kv_len (admission sets it exactly; refreshed at
        # each tick's chunk sync) — page planning must not sync the device
        self._kv_len_host = np.zeros((num_slots,), np.int64)
        # (request, device first-token) pairs awaiting the tick's one sync
        self._pending_tok0: List[Tuple[_Request, Any]] = []

        self._requests: Dict[int, _Request] = {}
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._deferred: List[_Request] = []   # admission deferred (pool full)
        self._stop = False
        self._dead = False

        pad = tokenizer.pad_token_id
        eos = tokenizer.eos_token_id
        n_inner = self.decode_steps

        @jax.jit
        def decode_step(params, cache, kv_len, last_tok, active_mask):
            """Decode `n_inner` tokens per dispatch via lax.scan. Slots that
            emit eos mid-chunk go dead (emit pad, kv_len frozen); their
            stale-position KV rewrites are never attended after reuse
            (prefill re-splices from 0, attention masks by kv_len)."""

            def inner(carry, _):
                cache, kv_len, last_tok, alive = carry
                emb = model.apply(params, last_tok[:, None],
                                  method=model.embed)
                logits, _, cache = model.apply(
                    params, inputs_embeds=emb, positions=kv_len[:, None],
                    kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1)
                nxt = greedy(logits[:, -1])
                nxt = jnp.where(alive, nxt, pad)
                kv_len = kv_len + alive.astype(kv_len.dtype)
                last_tok = jnp.where(alive, nxt, last_tok)
                alive = jnp.logical_and(alive, nxt != eos)
                return (cache, kv_len, last_tok, alive), nxt

            (cache, kv_len, last_tok, _), toks = jax.lax.scan(
                inner, (cache, kv_len, last_tok, active_mask), None,
                length=n_inner)
            return cache, kv_len, last_tok, toks.T   # [S, n_inner]

        self._decode_step = decode_step
        self._prefill_cache: Dict[int, callable] = {}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API
    def submit(self, prompt: str) -> Future:
        if self._dead:
            raise RuntimeError("batcher serving loop has terminated")
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

    def _remaining(self, req: _Request) -> int:
        # budget left for a (possibly preempted-and-resumed) request; its
        # prior emissions are part of req.ids by the time it is re-admitted
        return self.max_new_tokens - len(req.emitted)

    def _admit(self, req: _Request, slot: int):
        ids = req.ids[: self.max_len - self._remaining(req)]
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
        self._kv_len_host[slot] = len(ids)
        self.last_tok = self.last_tok.at[slot].set(tok0[0])  # device-side
        self.active[slot] = True
        req.slot = slot
        self._pending_tok0.append((req, tok0))   # resolved at the tick sync
        self.budget[slot] = self._remaining(req) - 1   # -1: pending tok0
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
        try:
            while not self._stop:
                self._tick()
        except Exception as exc:  # fail every pending future, don't hang them
            self._dead = True
            pending = list(self._requests.values()) + self._deferred
            while True:
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            for req in pending:
                if not req.future.done():
                    req.future.set_exception(exc)

    def _tick(self):
        eos = self.tokenizer.eos_token_id
        # admit deferred-then-new requests into free slots; stop at the first
        # request the pool can't hold yet (deferral instead of raising)
        while not all(self.active):
            if self._deferred:
                req = self._deferred[0]
                if not self._feasible(req):
                    self._deferred.pop(0)
                    req.future.set_exception(RuntimeError(
                        "request can never fit in the paged KV pool "
                        f"({len(req.ids)} prompt tokens)"))
                    continue
                if not self._can_admit(req):
                    break
                self._deferred.pop(0)
            else:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if not self._feasible(req):
                    req.future.set_exception(RuntimeError(
                        "request can never fit in the paged KV pool "
                        f"({len(req.ids)} prompt tokens)"))
                    continue
                if not self._can_admit(req):
                    self._deferred.append(req)
                    break
            slot = int(np.argmin(self.active))
            self._admit(req, slot)
        if not self.active.any():
            if self._deferred:
                # nothing running, so every pool page is free; if the head
                # request STILL can't be admitted it can never fit — fail it
                # instead of spinning forever
                req = self._deferred[0]
                if not self._can_admit(req) or not self._feasible(req):
                    self._deferred.pop(0)
                    req.future.set_exception(RuntimeError(
                        "request can never fit in the paged KV pool "
                        f"({len(req.ids)} prompt tokens)"))
            else:
                try:
                    self._deferred.append(self._queue.get(timeout=0.05))
                except queue.Empty:
                    pass
            return
        # check finishes BEFORE stepping (first token may already be eos)
        for slot in np.where(self.active)[0]:
            req = self._requests[slot]
            if req.emitted and (req.emitted[-1] == eos
                                or self.budget[slot] <= 0):
                self._finish(slot)
        if not self.active.any():
            return
        self._pre_step()
        if not self.active.any():   # _pre_step may preempt every slot
            return
        mask = jnp.asarray(self.active)
        self.cache, self.kv_len, self.last_tok, chunk = self._step(mask)
        toks = np.asarray(chunk)                       # [S, decode_steps]
        # THE tick sync just happened — resolve admission first tokens in
        # one batched pull (they precede this tick's chunk in the stream)
        # and refresh the kv_len mirror for the next page-growth plan.
        if self._pending_tok0:
            vals = jax.device_get([t for _, t in self._pending_tok0])
            for (req, _), v in zip(self._pending_tok0, vals):
                req.emitted.append(int(v[0]))
            self._pending_tok0.clear()
        self._kv_len_host = np.array(self.kv_len, np.int64)  # writable copy
        for slot in np.where(self.active)[0]:
            req = self._requests[slot]
            if req.emitted and req.emitted[-1] == eos:
                continue   # first token was already eos; chunk is over-decode
            for t in toks[slot]:
                if self.budget[slot] <= 0:
                    break                              # over-decode discarded
                req.emitted.append(int(t))
                self.budget[slot] -= 1
                if int(t) == eos:
                    break

    def _make_cache(self, cfg, num_slots, max_len):
        return init_kv_cache(cfg, num_slots, max_len)

    def _can_admit(self, req: _Request) -> bool:
        return True

    def _feasible(self, req: _Request) -> bool:
        """Whether the pool can hold this request over its whole lifetime
        (admission check — prevents a mid-decode self-preempt livelock)."""
        return True

    def _pre_step(self):
        pass

    def _step(self, mask):
        return self._decode_step(self.params, self.cache, self.kv_len,
                                 self.last_tok, mask)


class PagedContinuousBatcher(ContinuousBatcher):
    """Continuous batcher over a block-paged KV pool: slots map logical
    pages to pool blocks via a host-managed page table, so heterogeneous
    prompt lengths never pin max_len per slot — the pool can hold MORE
    concurrent sequences in the same HBM (decode throughput scales with
    occupancy while weights dominate the per-step reads).

    num_blocks defaults to num_slots * max_len / page (same worst case as
    the contiguous batcher); lower it to oversubscribe."""

    def __init__(self, model: LlamaForCausalLM, params, tokenizer,
                 num_slots: int = 8, max_len: int = 1024,
                 max_new_tokens: int = 128, prefill_bucket: int = 128,
                 page: int = 128, num_blocks: Optional[int] = None):
        from spider_tpu.models.llama import init_paged_kv_cache

        assert prefill_bucket % page == 0, (prefill_bucket, page)
        self.page = page
        self.max_pages = max_len // page
        # +1: block 0 is a reserved scratch block. Inactive slots still run
        # the (branch-free) scatter-write every tick, and their zeroed
        # page-table rows route those writes to block 0 — it must never be
        # allocated or a live slot's page would be corrupted mid-stream.
        n_blocks = (num_blocks or num_slots * self.max_pages) + 1
        self._n_blocks = n_blocks
        cfg = model.config

        # host-managed page state
        self._free = list(range(1, n_blocks))
        self.n_preempts = 0  # telemetry (and test hook)
        self._table = np.zeros((num_slots, self.max_pages), np.int32)
        self._n_alloc = np.zeros((num_slots,), np.int32)
        self._pool = init_paged_kv_cache(cfg, n_blocks, page)

        super().__init__(model, params, tokenizer, num_slots=num_slots,
                         max_len=max_len, max_new_tokens=max_new_tokens,
                         prefill_bucket=prefill_bucket)
        pad = tokenizer.pad_token_id
        eos = tokenizer.eos_token_id
        n_inner = self.decode_steps

        @jax.jit
        def paged_step(params, cache, kv_len, last_tok, active_mask, table):
            def inner(carry, _):
                cache, kv_len, last_tok, alive = carry
                emb = model.apply(params, last_tok[:, None],
                                  method=model.embed)
                logits, _, cache = model.apply(
                    params, inputs_embeds=emb, positions=kv_len[:, None],
                    kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1,
                    page_table=table)
                nxt = greedy(logits[:, -1])
                nxt = jnp.where(alive, nxt, pad)
                kv_len = kv_len + alive.astype(kv_len.dtype)
                last_tok = jnp.where(alive, nxt, last_tok)
                alive = jnp.logical_and(alive, nxt != eos)
                return (cache, kv_len, last_tok, alive), nxt

            (cache, kv_len, last_tok, _), toks = jax.lax.scan(
                inner, (cache, kv_len, last_tok, active_mask), None,
                length=n_inner)
            return cache, kv_len, last_tok, toks.T

        self._paged_step = paged_step

        @jax.jit
        def write_pages(cache, small, blocks, n_pages):
            # scatter a prefilled contiguous cache [L, 1, bucket, H, D] into
            # pool blocks listed in `blocks` [max_pages] (first n_pages used)
            pk, pv = cache
            sk, sv = small
            L, _, bucket, H, D = sk.shape
            P = pk.shape[2]
            pages = sk.reshape(L, bucket // P, P, H, D)
            pagesv = sv.reshape(L, bucket // P, P, H, D)

            def body(i, c):
                pk, pv = c
                b = blocks[i]
                pk = jax.lax.dynamic_update_index_in_dim(
                    pk, pages[:, i].astype(pk.dtype), b, axis=1)
                pv = jax.lax.dynamic_update_index_in_dim(
                    pv, pagesv[:, i].astype(pv.dtype), b, axis=1)
                return pk, pv

            return jax.lax.fori_loop(0, n_pages, body, (pk, pv))

        self._write_pages = write_pages

    def _make_cache(self, cfg, num_slots, max_len):
        return self._pool

    def _alloc_page(self, slot: int, logical: int):
        if not self._free:
            raise RuntimeError("paged KV pool exhausted")
        self._table[slot, logical] = self._free.pop()
        self._n_alloc[slot] = logical + 1

    def _can_admit(self, req: _Request) -> bool:
        ids_len = min(len(req.ids), self.max_len - self._remaining(req))
        return len(self._free) >= -(-max(ids_len, 1) // self.page)

    def _feasible(self, req: _Request) -> bool:
        # lifetime worst case: prompt + full budget (trunc keeps it <= max_len)
        ids_len = min(len(req.ids), self.max_len - self._remaining(req))
        worst = min(ids_len + self._remaining(req), self.max_len)
        total = self._n_blocks - 1   # block 0 = reserved scratch
        return total >= -(-max(worst, 1) // self.page)

    def _preempt(self, slot: int):
        """Evict a slot mid-decode: free its pages and requeue the request
        as a continuation prefill (prompt + tokens emitted so far). Called
        on pool exhaustion instead of killing the serving loop."""
        self.n_preempts += 1
        req = self._requests.pop(slot)
        # a same-tick admit may still have its first token in flight: drop
        # it — the continuation re-prefills from the same ids, and greedy
        # regenerates the identical token (budget is recomputed on admit)
        self._pending_tok0 = [(r, t) for (r, t) in self._pending_tok0
                              if r is not req]
        n = int(self._n_alloc[slot])
        self._free.extend(int(b) for b in self._table[slot, :n])
        self._table[slot, :] = 0
        self._n_alloc[slot] = 0
        self.active[slot] = False
        req.ids = req.ids + req.emitted[req.n_consumed:]
        req.n_consumed = len(req.emitted)
        self._deferred.append(req)

    def _admit(self, req: _Request, slot: int):
        ids = req.ids[: self.max_len - self._remaining(req)]
        bucket = ((len(ids) + self.prefill_bucket - 1)
                  // self.prefill_bucket) * self.prefill_bucket
        bucket = max(bucket, self.page)
        arr = np.full((1, bucket), self.tokenizer.pad_token_id, np.int64)
        arr[0, : len(ids)] = ids
        small, tok0 = self._prefill_fn(bucket)(
            self.params, jnp.asarray(arr),
            jnp.asarray([len(ids)], jnp.int32))
        n_pages = -(-len(ids) // self.page)
        # bucket is a multiple of page (prefill_bucket is); allocate + scatter
        self._table[slot] = 0
        for i in range(n_pages):
            self._alloc_page(slot, i)
        blocks = np.zeros((self.max_pages,), np.int32)
        blocks[:n_pages] = self._table[slot, :n_pages]
        self.cache = self._write_pages(self.cache, small,
                                       jnp.asarray(blocks),
                                       jnp.asarray(n_pages))
        self.kv_len = self.kv_len.at[slot].set(len(ids))
        self._kv_len_host[slot] = len(ids)
        self.last_tok = self.last_tok.at[slot].set(tok0[0])  # device-side
        self.active[slot] = True
        req.slot = slot
        self._pending_tok0.append((req, tok0))   # resolved at the tick sync
        self.budget[slot] = self._remaining(req) - 1   # -1: pending tok0
        self._requests[slot] = req

    def _finish(self, slot: int):
        # free exactly the pages this slot allocated (_n_alloc counts both
        # admit-time and decode-grown pages)
        n = int(self._n_alloc[slot])
        self._free.extend(int(b) for b in self._table[slot, :n])
        self._table[slot, :] = 0
        self._n_alloc[slot] = 0
        super()._finish(slot)

    def _pre_step(self):
        # the coming chunk writes positions kv_len[s] .. kv_len[s]+k-1 where
        # k = min(decode_steps, budget[s]) (tokens past budget are discarded
        # host-side, so their lost writes never matter): make sure every
        # covering page exists before the device dispatch. On pool
        # exhaustion, preempt the largest-allocated other slot (frees the
        # most pages) — the evicted request re-prefills later as a
        # continuation. A slot only self-preempts when infeasible, which
        # admission (_feasible) already rejects.
        lens = self._kv_len_host   # host mirror: planning must not sync
        for slot in np.where(self.active)[0]:
            if not self.active[slot]:   # already preempted as a victim
                continue
            k = max(1, min(self.decode_steps, int(self.budget[slot])))
            last_logical = min((int(lens[slot]) + k - 1) // self.page,
                               self.max_pages - 1)
            for logical in range(int(self._n_alloc[slot]), last_logical + 1):
                while not self._free:
                    victims = [s for s in np.where(self.active)[0]
                               if s != slot and self.active[s]]
                    victim = (max(victims, key=lambda s: self._n_alloc[s])
                              if victims else slot)
                    self._preempt(int(victim))
                    if victim == slot:
                        break
                if not self.active[slot]:
                    break
                self._alloc_page(slot, logical)

    def _step(self, mask):
        return self._paged_step(self.params, self.cache, self.kv_len,
                                self.last_tok, mask,
                                jnp.asarray(self._table))
