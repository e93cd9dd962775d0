"""Web chat for the DeepSeek-R1-Distill-Llama-8B-class decoder
(cf. /root/reference/r1_llama3_8B_gradio.py — a Gradio textbox chat over
model.generate). Headless stack: the stdlib HTTP server serves the same
chat page as the any-to-many demo, with no task decoders attached — text
in, text out, streamed over SSE.

Run: python r1_llama3_8B_gradio.py [--port 6006]
Real weights: SPIDER_TPU_LLM_CKPT=/path/to/hf_dir (converted on load).
"""

from __future__ import annotations

import argparse
import os


def main():
    from spider_tpu.common.config import Config
    from spider_tpu.models.serving_utils import load_or_init_llm
    from spider_tpu.serving.http_server import serve
    from spider_tpu.serving.spider_free import SpiderFree, make_llama_chat_fn

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=6006)  # reference port
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--max-new-tokens", type=int, default=512)
    args = parser.parse_args()

    model, params, tokenizer = load_or_init_llm(
        os.environ.get("SPIDER_TPU_LLM_CKPT"))
    chat_fn = make_llama_chat_fn(model, params, tokenizer,
                                 max_new_tokens=args.max_new_tokens,
                                 speculative=True)
    # plain chatbot: empty decoder set, no tag system prompt
    cfg = Config.fromdict({"model": {"type": "spider_decoder",
                                     "system_prompt": ""}})
    sf = SpiderFree(cfg, chat_fn, decoders={})
    serve(sf, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
