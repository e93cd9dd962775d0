"""Model zoo. Importing this package registers every model class with the
registry — the same glue the reference wires through star-imports in
/root/reference/spider/__init__.py:13-18 ("spider", "spider_decoder",
"sd", "vd", "ad", plus our "sdxl_story")."""

from spider_tpu.models import llama  # noqa: F401
from spider_tpu.models import spider  # noqa: F401
from spider_tpu.models import spider_decoder  # noqa: F401
from spider_tpu.models.pipelines import ad, sd, sdxl_story, vd  # noqa: F401
