"""Qwen2.5-Omni-backed SpiderFree entry
(cf. /root/reference/qwen2.5omni_infer.py / qwen2.5omni_spider_web.py).

The omni chat model is pluggable, in preference order:
  1. transformers' Qwen2.5-Omni (QWEN_OMNI_PATH set): the correct
     ``Qwen2_5OmniForConditionalGeneration`` class with audio/image/video
     routed through the processor exactly as the reference does
     (qwen2.5omni_spider_web.py:368-383 load, :458-466 process_mm_info).
  2. The in-framework flax Omni thinker (audio+vision towers + qwen2
     decoder, models/qwen_omni.py) — random-init unless a converted
     checkpoint is supplied; runs the full any-modality -> text path in JAX.
  3. The in-framework Llama decoder as a text-only chat backbone.

Multimodal inputs are NEVER silently dropped: a text-only backbone raises
if audio/images/videos are passed.
"""

from __future__ import annotations

import os
import sys

from spider_tpu.common.config import Config
from spider_tpu.serving.spider_free import SpiderFree, make_llama_chat_fn


def build_omni_chat_fn(qwen_path: str):
    """Adapter over transformers Qwen2.5-Omni: accepts (text, audios,
    images, videos) and returns the text answer (speech output, when the
    talker is enabled, is returned alongside)."""
    from transformers import AutoProcessor

    try:
        from transformers import Qwen2_5OmniForConditionalGeneration as _Omni
    except ImportError:  # older transformers naming
        from transformers import Qwen2_5OmniModel as _Omni

    processor = AutoProcessor.from_pretrained(qwen_path)
    model = _Omni.from_pretrained(qwen_path)

    def chat_fn(prompt: str, audios=None, images=None, videos=None) -> str:
        conversation = [{
            "role": "user",
            "content": ([{"type": "audio", "audio": a} for a in audios or []]
                        + [{"type": "image", "image": i} for i in images or []]
                        + [{"type": "video", "video": v} for v in videos or []]
                        + [{"type": "text", "text": prompt}]),
        }]
        text = processor.apply_chat_template(conversation, tokenize=False,
                                             add_generation_prompt=True)
        inputs = processor(text=text, audio=audios, images=images,
                           videos=videos, return_tensors="pt", padding=True)
        out = model.generate(**inputs, max_new_tokens=512)
        # slice off the echoed prompt by token count (the decoded template
        # text can't be string-matched: it contains special tokens that
        # skip_special_tokens drops)
        gen = out[:, inputs["input_ids"].shape[1]:]
        return processor.batch_decode(gen, skip_special_tokens=True)[0]

    return chat_fn


def build_chat_fn():
    qwen_path = os.environ.get("QWEN_OMNI_PATH")
    if qwen_path and os.path.isdir(qwen_path):
        return build_omni_chat_fn(qwen_path)

    if os.environ.get("SPIDER_TPU_OMNI", ""):  # native flax Omni thinker
        from spider_tpu.models.qwen_omni import build_omni_thinker_chat_fn

        return build_omni_thinker_chat_fn(
            os.environ.get("SPIDER_TPU_OMNI_CKPT"))

    from spider_tpu.models.serving_utils import load_or_init_llm

    model, params, tokenizer = load_or_init_llm(
        os.environ.get("SPIDER_TPU_LLM_CKPT"))
    text_fn = make_llama_chat_fn(model, params, tokenizer, max_new_tokens=128)

    def chat_fn(prompt: str, audios=None, images=None, videos=None) -> str:
        if audios or images or videos:
            raise ValueError(
                "text-only Llama backbone cannot consume audio/image/video "
                "inputs — set QWEN_OMNI_PATH (torch Omni) or SPIDER_TPU_OMNI=1 "
                "(flax Omni thinker) for multimodal understanding")
        return text_fn(prompt)

    return chat_fn


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
