"""Web front-end launcher (reference path parity:
/root/reference/demo/frontend.py — gradio replaced by the stdlib server)."""

from spider_tpu.serving.http_server import serve  # noqa: F401


def build_chat(spider_free, port: int = 7860, background: bool = False):
    """Start the chat UI for a SpiderFree instance (build_chat parity,
    frontend.py:772)."""
    return serve(spider_free, port=port, background=background)
