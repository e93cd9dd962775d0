"""Task layer (cf. /root/reference/spider/tasks/base_task.py:31-170): builds
the model from cfg.model.type via the registry, builds {split: {name:
dataset}} dicts with batch_size/sample_ratio attached, merges evaluation
results across processes."""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict

import jax

from spider_tpu.common.registry import registry


class BaseTask:
    def __init__(self, **kwargs):
        self.inst_id_key = "instance_id"

    @classmethod
    def setup_task(cls, **kwargs):
        return cls()

    def build_model(self, cfg):
        model_config = dict(cfg.model)
        model_type = model_config.pop("type")
        model_cls = registry.get_model_class(model_type)
        assert model_cls is not None, f"unknown model {model_type}"
        if hasattr(model_cls, "from_config"):
            return model_cls.from_config(model_config)
        return model_cls(**model_config)

    def build_datasets(self, cfg) -> Dict[str, Dict[str, Any]]:
        """cfg.datasets: {name: {batch_size, sample_ratio, build_info, ...}}
        -> {split: {name: dataset}} with attributes attached
        (base_task.py:42-99)."""
        datasets: Dict[str, Dict[str, Any]] = {}
        for name, dataset_cfg in cfg.datasets.items():
            builder_cls = registry.get_builder_class(name)
            assert builder_cls is not None, f"unknown builder {name}"
            # Shard data across processes: every DP rank draws DIFFERENT
            # samples (per-source seed offset) while the ratio-mixing RNG
            # stays shared (loaders.py replaces the reference's rank-0
            # broadcast, dataloader_utils.py:45-62).
            dataset_cfg = dict(dataset_cfg)
            build_info = dict(dataset_cfg.get("build_info", {}))
            build_info["seed"] = (build_info.get("seed", 0)
                                  + jax.process_index() * 9973)
            dataset_cfg["build_info"] = build_info
            builder = builder_cls(dataset_cfg)
            dataset = builder.build_datasets()
            if dataset is None:
                logging.warning("builder %s produced no dataset", name)
                continue
            split = dict(dataset_cfg).get("split", "train")
            entry = datasets.setdefault(split, {})
            entry[name] = dict(
                dataset=dataset,
                batch_size=dict(dataset_cfg).get("batch_size", 1),
                sample_ratio=dict(dataset_cfg).get("sample_ratio", 1.0),
            )
        return datasets

    def train_step(self, runner, samples):
        return runner.model_forward(samples)

    def evaluation(self, model, data_loader, max_batches: int = 8):
        results = []
        for i, samples in enumerate(data_loader):
            if i >= max_batches:
                break
            out = model.forward(samples)
            results.append({k: float(v) for k, v in out.items()})
        return results

    def save_result(self, results, result_dir, filename) -> str:
        """Per-process shards merged by process 0
        (base_task.py:132-170)."""
        os.makedirs(result_dir, exist_ok=True)
        rank = jax.process_index()
        shard = os.path.join(result_dir, f"{filename}_rank{rank}.json")
        with open(shard, "w") as f:
            json.dump(results, f)
        final = os.path.join(result_dir, f"{filename}.json")
        if rank == 0:
            merged = []
            for r in range(jax.process_count()):
                path = os.path.join(result_dir, f"{filename}_rank{r}.json")
                if os.path.exists(path):
                    with open(path) as f:
                        merged.extend(json.load(f))
            with open(final, "w") as f:
                json.dump(merged, f)
        return final


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    pass
