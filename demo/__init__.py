"""Reference-compatible import surface: `from demo.inference_api import
SpiderInference` / `from demo.frontend import build_chat` keep working for
users migrating from Layjins/Spider (cf. /root/reference/demo/)."""
