"""Task registry (cf. /root/reference/spider/tasks/__init__.py:14-21)."""

from spider_tpu.common.registry import registry
from spider_tpu.tasks.base_task import BaseTask, ImageTextPretrainTask  # noqa: F401


def setup_task(cfg):
    task_name = cfg.run.task if "task" in cfg.run else "image_text_pretrain"
    task_cls = registry.get_task_class(task_name)
    assert task_cls is not None, f"unknown task {task_name}"
    return task_cls.setup_task(cfg=cfg)
