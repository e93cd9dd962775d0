"""Request batcher for LLM serving: groups concurrent chat requests into
right-padded batches for one jitted generate call per wave (decode is
HBM-bound on weights, so batching multiplies tokens/s/chip — see
bench_suite.py). Length-bucketed to bound the number of compiled programs.

The reference serves strictly one request at a time through HF generate
(demo/inference_api.py); this is the production-serving counterpart.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.decode import GenerateConfig, generate


class LlmBatcher:
    def __init__(self, model, params, tokenizer,
                 gen_cfg: Optional[GenerateConfig] = None,
                 max_batch_size: int = 8, max_wait_s: float = 0.02,
                 length_bucket: int = 128):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.gen_cfg = gen_cfg or GenerateConfig(
            max_new_tokens=128,
            eos_ids=(tokenizer.eos_token_id,),
            pad_id=tokenizer.pad_token_id)
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_s
        self.length_bucket = length_bucket
        self._queue: "queue.Queue[Tuple[List[int], Future]]" = queue.Queue()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API
    def submit(self, prompt: str) -> Future:
        ids = list(self.tokenizer(prompt, add_special_tokens=True).input_ids)
        fut: Future = Future()
        self._queue.put((ids, fut))
        return fut

    def chat(self, prompt: str, timeout: float = 600.0) -> str:
        return self.submit(prompt).result(timeout)

    def close(self):
        self._stop = True
        self._queue.put(([], Future()))
        self._thread.join(timeout=5)

    # ---------------------------------------------------------------- worker
    def _collect_wave(self):
        first = self._queue.get()
        if self._stop:
            return []
        wave = [first]
        deadline = self.max_wait_s
        while len(wave) < self.max_batch_size:
            try:
                item = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if self._stop:
                break
            wave.append(item)
        return wave

    def _run_wave(self, wave):
        ids_list = [ids for ids, _ in wave]
        plen = np.array([len(i) for i in ids_list], np.int32)
        bucket = self.length_bucket
        L = ((int(plen.max()) + bucket - 1) // bucket) * bucket
        pad = self.tokenizer.pad_token_id
        arr = np.full((len(wave), L), pad, np.int64)
        for i, ids in enumerate(ids_list):
            arr[i, : len(ids)] = ids[:L]
        embeds = self.model.apply(self.params, jnp.asarray(arr),
                                  method=self.model.embed)
        out = generate(self.model, self.params, embeds,
                       jnp.asarray(np.minimum(plen, L)), self.gen_cfg)
        tokens = np.asarray(out["tokens"])
        for i, (_, fut) in enumerate(wave):
            toks = [int(t) for t in tokens[i] if int(t) != pad]
            fut.set_result(self.tokenizer.decode(toks,
                                                 skip_special_tokens=True))

    def _loop(self):
        while not self._stop:
            wave = self._collect_wave()
            if not wave:
                continue
            try:
                self._run_wave(wave)
            except Exception as e:  # propagate to callers
                for _, fut in wave:
                    if not fut.done():
                        fut.set_exception(e)
