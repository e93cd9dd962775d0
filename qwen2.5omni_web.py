"""Plain Qwen2.5-Omni web chat — NO Spider decoders
(cf. /root/reference/qwen2.5omni_web.py: the Omni-only Gradio demo with
text + audio/image/video understanding in and text + SPEECH out).

Headless stack: the stdlib HTTP chat page with multimodal uploads routed
to the Omni chat backbone; replies stream over SSE and, when the native
speech pipeline is active, include the talker's synthesized audio.

Backbones, in order of preference:
  * OMNI_CKPT set + torch weights     -> the torch Omni adapter
    (qwen2.5omni_infer.build_omni_chat_fn)
  * otherwise                          -> the native flax speech pipeline
    (tiny random-init unless converted checkpoints are wired), returning
    text AND the token2wav waveform like the reference's speech path.

Run: python qwen2.5omni_web.py [--port 7860]
"""

from __future__ import annotations

import argparse
import importlib.util
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name.replace(".", "_"), os.path.join(_HERE, name))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _OmniSpeechChat:
    """SpiderFree-compatible chat with a speech side-channel: the last
    reply's waveform is appended to the event stream by chat_stream's
    caller via the `last_wav` attribute."""

    def __init__(self):
        from spider_tpu.models.omni_speech import build_tiny_omni_speech

        self.pipe = build_tiny_omni_speech()
        self.last_wav: np.ndarray | None = None

    def __call__(self, prompt: str, audios=None, images=None, videos=None):
        text, wav = self.pipe.chat_with_speech(
            prompt, audios=audios, images=images, videos=videos)
        self.last_wav = wav
        return text


def main():
    from spider_tpu.common.config import Config
    from spider_tpu.serving.http_server import serve
    from spider_tpu.serving.spider_free import SpiderFree

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args()

    qwen_path = os.environ.get("OMNI_CKPT")
    speech = None
    if qwen_path:
        qwen_infer = _load_script("qwen2.5omni_infer.py")
        chat_fn = qwen_infer.build_omni_chat_fn(qwen_path)
    else:
        speech = _OmniSpeechChat()
        chat_fn = speech

    cfg = Config.fromdict({"model": {"type": "spider_decoder",
                                     "system_prompt": ""}})
    sf = SpiderFree(cfg, chat_fn, decoders={})

    if speech is not None:
        # wrap chat_stream so the talker waveform streams as an audio event
        inner = sf.chat_stream

        def chat_stream(*a, **kw):
            for ev in inner(*a, **kw):
                yield ev
            if speech.last_wav is not None and speech.last_wav.size:
                yield "audio", dict(media=speech.last_wav,
                                    caption="(speech reply)")

        sf.chat_stream = chat_stream
    serve(sf, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
