"""Qwen2.5-Omni-backed SpiderFree entry
(cf. /root/reference/qwen2.5omni_infer.py / qwen2.5omni_spider_web.py).

The omni chat model is pluggable: if transformers' Qwen2.5-Omni weights are
available locally (QWEN_OMNI_PATH), an adapter wraps its generate; otherwise
the in-framework Llama decoder serves as the chat backbone so the full
any-to-many pipeline still runs."""

from __future__ import annotations

import os
import sys

from spider_tpu.common.config import Config
from spider_tpu.serving.spider_free import SpiderFree, make_llama_chat_fn


def build_chat_fn():
    qwen_path = os.environ.get("QWEN_OMNI_PATH")
    if qwen_path and os.path.isdir(qwen_path):
        from transformers import AutoProcessor, AutoModelForCausalLM

        processor = AutoProcessor.from_pretrained(qwen_path)
        model = AutoModelForCausalLM.from_pretrained(qwen_path)

        def chat_fn(prompt: str) -> str:
            inputs = processor(text=prompt, return_tensors="pt")
            out = model.generate(**inputs, max_new_tokens=512)
            return processor.batch_decode(out, skip_special_tokens=True)[0]

        return chat_fn
    from spider_tpu.models.serving_utils import load_or_init_llm

    model, params, tokenizer = load_or_init_llm(
        os.environ.get("SPIDER_TPU_LLM_CKPT"))
    return make_llama_chat_fn(model, params, tokenizer, max_new_tokens=128)


def main():
    text = sys.argv[1] if len(sys.argv) > 1 else \
        "Please generate an image and an audio for a running horse."
    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__),
                                       "train_configs", "spider_decoder_cfg.py"))
    from spider_decoder_infer import build_default_decoders

    sf = SpiderFree(cfg, build_chat_fn(), decoders=build_default_decoders())
    events, answers, predictions, predictions_text = sf.chat(text)
    print("answer:", answers[0] if answers else "")
    for kind, payload in events:
        if kind != "text":
            print("event:", kind)


if __name__ == "__main__":
    main()
