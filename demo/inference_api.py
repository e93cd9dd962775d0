"""Alias module (reference path parity: /root/reference/demo/inference_api.py)."""

from spider_tpu.serving.inference_api import SpiderInference  # noqa: F401
