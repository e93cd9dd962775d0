"""Training engine. Importing registers runner classes
(cf. /root/reference/spider/__init__.py:17 star-importing runners)."""

from spider_tpu.runners import runner  # noqa: F401
