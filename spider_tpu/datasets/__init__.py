"""Dataset builders. Importing registers all 21 builders with the registry
(mirrors /root/reference/spider/datasets/__init__.py:1-21)."""

from spider_tpu.datasets import grounding  # noqa: F401
from spider_tpu.datasets import story  # noqa: F401
from spider_tpu.datasets import text2x  # noqa: F401
from spider_tpu.datasets import travel_guide  # noqa: F401
from spider_tpu.datasets import x2text  # noqa: F401
