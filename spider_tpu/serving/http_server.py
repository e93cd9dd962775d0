"""Headless web demo: stdlib HTTP JSON API replacing the reference's Gradio
front-ends (/root/reference/demo/frontend.py:772-863,
qwen2.5omni_spider_web.py:_launch_demo). POST /chat with {"text": ...} ->
{"answer": ..., "events": [...]} with media base64-encoded; GET / serves a
minimal chat page."""

from __future__ import annotations

import base64
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np

_PAGE = """<!doctype html><html><head><title>spider-tpu</title></head>
<body><h2>spider-tpu any-to-many chat</h2>
<textarea id=q rows=3 cols=80></textarea><br>
<button onclick="send()">Send</button><div id=out></div>
<script>
async function send(){
 const r = await fetch('/chat', {method:'POST', headers:{'Content-Type':'application/json'},
   body: JSON.stringify({text: document.getElementById('q').value})});
 const j = await r.json();
 let html = '<p>'+j.answer+'</p>';
 for (const ev of j.events){
   if (ev.kind=='image'||ev.kind=='mask') html += '<img src="data:image/png;base64,'+ev.data+'"/>';
   if (ev.kind=='audio') html += '<audio controls src="data:audio/wav;base64,'+ev.data+'"></audio>';
 }
 document.getElementById('out').innerHTML = html;
}
</script></body></html>"""


def _encode_image(arr: np.ndarray) -> str:
    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _encode_wav(wave: np.ndarray, sample_rate: int = 16000) -> str:
    import struct
    import wave as wavmod

    pcm = (np.clip(np.asarray(wave).reshape(-1), -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def serialize_event(kind: str, payload: Any) -> dict:
    if kind in ("image", "mask", "story"):
        if kind == "story":
            return {"kind": "story",
                    "data": [_encode_image(im) for im in payload["images"]]}
        media = payload["media"] if isinstance(payload, dict) else payload
        return {"kind": kind, "data": _encode_image(media),
                "caption": payload.get("caption", "") if isinstance(payload, dict) else ""}
    if kind == "audio":
        media = payload["media"] if isinstance(payload, dict) else payload
        return {"kind": "audio", "data": _encode_wav(media)}
    if kind == "video":
        media = payload["media"] if isinstance(payload, dict) else payload
        frames = [_encode_image(f) for f in np.asarray(media)[0]] \
            if np.asarray(media).ndim == 5 else \
            [_encode_image(f) for f in np.asarray(media)]
        return {"kind": "video", "data": frames}
    if kind == "box":
        return {"kind": "box", **{k: v for k, v in payload.items()}}
    return {"kind": kind, "data": str(payload)}


def build_ask_info(req: dict) -> dict:
    """Assemble decoder-side inputs from a request (the role of
    frontend.py:503-651): base64 'image' -> Image_ori_array + IMAGE_SAM +
    Meta_info so the MASK/BOX decoders can run; 'audio'/'video' payloads are
    forwarded raw for the chat backbone."""
    import numpy as np

    ask: dict = {}
    if req.get("image"):
        from PIL import Image

        from spider_tpu.processors.vision import sam_preprocess

        raw = base64.b64decode(req["image"])
        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        sam_img, sam_hw = sam_preprocess(img)
        ask["Image_ori_array"] = [img]
        ask["IMAGE_SAM"] = [sam_img]
        ask["Meta_info"] = {"original_shape": [img.shape[:2]],
                            "sam_shape": [sam_hw]}
    return ask


def make_handler(spider_free):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            logging.debug(*args)

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.encode())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            events, answers, _, _ = spider_free.chat(
                req.get("text", ""), extra_inputs=build_ask_info(req))
            body = json.dumps({
                "answer": answers[0] if answers else "",
                "events": [serialize_event(k, p) for k, p in events
                           if k != "text"],
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(spider_free, host: str = "127.0.0.1", port: int = 7860,
          background: bool = False):
    server = ThreadingHTTPServer((host, port), make_handler(spider_free))
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server
    logging.info("serving on http://%s:%d", host, port)
    server.serve_forever()
