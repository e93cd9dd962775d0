"""Training entry point: ``python train.py <config.py>``
(cf. /root/reference/train.py:65-95, minus the deepspeed launcher — TPU pods
rendezvous through jax.distributed inside init_distributed_mode)."""

from __future__ import annotations

import logging
import random

import numpy as np

from spider_tpu import register_all
from spider_tpu.common import dist
from spider_tpu.common.config import Config, apply_overrides, parse_args
from spider_tpu.common.logger import setup_logger
from spider_tpu.common.registry import registry
from spider_tpu.common.utils import now


def setup_seeds(cfg) -> None:
    seed = int(cfg.run.get("seed", 42)) + dist.get_rank()
    random.seed(seed)
    np.random.seed(seed)


def main() -> None:
    register_all()
    from spider_tpu import tasks

    job_id = now()
    args = parse_args()
    cfg = Config.fromfile(args.cfg_path)
    cfg = apply_overrides(cfg, args.options)

    dist.init_distributed_mode()
    output_dir = cfg.run.get("output_dir", f"output/{job_id}")
    registry.register_path("output_dir", output_dir)
    setup_logger(output_dir)
    setup_seeds(cfg)

    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)

    runner_cls = registry.get_runner_class(
        cfg.run.get("runner", "runner_base"))
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                        job_id=job_id)
    runner.train()


if __name__ == "__main__":
    main()
