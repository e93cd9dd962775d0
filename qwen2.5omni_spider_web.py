"""SpiderFree web demo (cf. /root/reference/qwen2.5omni_spider_web.py):
chat LLM (Qwen2.5-Omni adapter or the in-framework decoder) + tag-grammar
system prompt + Decoders-Controller behind the stdlib HTTP chat UI (the
gradio replacement)."""

from __future__ import annotations

import importlib.util
import os
import sys

from spider_tpu.common.config import Config
from spider_tpu.serving.http_server import serve
from spider_tpu.serving.spider_free import SpiderFree

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name.replace(".", "_"), os.path.join(_HERE, name))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 7860
    cfg = Config.fromfile(os.path.join(_HERE, "train_configs",
                                       "spider_decoder_cfg.py"))
    qwen_infer = _load_script("qwen2.5omni_infer.py")
    decoder_infer = _load_script("spider_decoder_infer.py")
    sf = SpiderFree(cfg, qwen_infer.build_chat_fn(),
                    decoders=decoder_infer.build_default_decoders())
    serve(sf, port=port)


if __name__ == "__main__":
    main()
