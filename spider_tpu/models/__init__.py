"""Model zoo. Importing registers model classes with the registry."""

from spider_tpu.models import llama  # noqa: F401
