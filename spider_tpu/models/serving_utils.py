"""Serving-side model loading helpers."""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple


def load_or_init_llm(ckpt_path: Optional[str] = None, tiny: Optional[bool] = None):
    """(model, params, tokenizer). With a checkpoint dir: convert/load the
    real DeepSeek-R1-Distill-Llama-8B weights + HF tokenizer. Otherwise:
    tiny random-init + TinyTokenizer (offline smoke)."""
    import jax
    import jax.numpy as jnp

    from spider_tpu.models import llama as L
    from spider_tpu.models.tokenizer import TinyTokenizer, load_tokenizer

    if ckpt_path and os.path.isdir(ckpt_path):
        from spider_tpu.models.convert import convert_llama_checkpoint

        cfg, params = convert_llama_checkpoint(ckpt_path)
        model = L.LlamaForCausalLM(cfg)
        tokenizer = load_tokenizer(ckpt_path)
        return model, params, tokenizer

    if tiny is None:
        tiny = True
    cfg = L.llama_tiny(vocab_size=512) if tiny else L.llama3_8b()
    model = L.LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 8), jnp.int32))
    logging.warning("no checkpoint provided: random-init %s",
                    "tiny" if tiny else "8B")
    return model, params, TinyTokenizer()
