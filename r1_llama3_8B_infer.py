"""Plain text chat entry (cf. /root/reference/r1_llama3_8B_infer.py:4-10) —
the CPU-runnable smoke path (BASELINE.json config #1). Loads the
DeepSeek-R1-Distill-Llama-8B architecture; random weights unless a converted
checkpoint path is given via SPIDER_TPU_LLM_CKPT."""

from __future__ import annotations

import os
import sys


def build_r1(tiny: bool = None):
    import jax
    import jax.numpy as jnp

    from spider_tpu.models import llama as L
    from spider_tpu.models.serving_utils import load_or_init_llm
    from spider_tpu.serving.spider_free import make_llama_chat_fn

    model, params, tokenizer = load_or_init_llm(
        os.environ.get("SPIDER_TPU_LLM_CKPT"), tiny=tiny)
    return make_llama_chat_fn(model, params, tokenizer, max_new_tokens=64)


def main():
    content = sys.argv[1] if len(sys.argv) > 1 else "Hello, who are you?"
    r1 = build_r1()
    print(r1(content))


if __name__ == "__main__":
    main()
