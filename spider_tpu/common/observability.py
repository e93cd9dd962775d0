"""Observability: metrics.jsonl -> TensorBoard export, and per-component
HBM budget reporting.

The reference streams per-iteration scalars straight into TensorBoard on
rank 0 (runner_base.py:98-99,243-247). Our runner writes a metrics.jsonl
stream (runner.py train_epoch) — this module converts it to TB event files
after (or during) a run, and reports device-memory budgets at serving
startup so multi-model residency (5+ resident decoders, SURVEY.md §7.2) is
visible before it OOMs.
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, Optional

import numpy as np


def export_tensorboard(metrics_jsonl: str, logdir: str) -> int:
    """Write every scalar in a metrics.jsonl stream into TensorBoard event
    files. Returns the number of steps exported."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception as e:  # torch TB not available: fail loudly, not silently
        raise RuntimeError(f"TensorBoard writer unavailable: {e}")

    writer = SummaryWriter(logdir)
    n = 0
    with open(metrics_jsonl) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = int(rec.get("step", n))
            for key, val in rec.items():
                if key in ("step", "epoch"):
                    continue
                try:
                    writer.add_scalar(key, float(val), step)
                except (TypeError, ValueError):
                    pass
            n += 1
    writer.close()
    return n


def tree_bytes(tree) -> int:
    import jax

    return sum(np.size(x) * np.dtype(getattr(x, "dtype", np.float32)).itemsize
               for x in jax.tree_util.tree_leaves(tree))


class HbmBudget:
    """Registry of resident components and their parameter footprints.

    Usage at serving startup:
        budget = HbmBudget()
        budget.register("llm(int8)", llm_params)
        budget.register("sd15", pipe_params)
        budget.report()
    """

    def __init__(self):
        self.components: Dict[str, int] = {}

    def register(self, name: str, tree) -> "HbmBudget":
        self.components[name] = tree_bytes(tree)
        return self

    def device_stats(self) -> Optional[Dict[str, Any]]:
        import jax

        try:
            return jax.local_devices()[0].memory_stats()
        except Exception:
            return None

    def report(self, log=logging.info) -> Dict[str, Any]:
        total = sum(self.components.values())
        rows = {k: round(v / 1e9, 3) for k, v in
                sorted(self.components.items(), key=lambda kv: -kv[1])}
        stats = self.device_stats() or {}
        out = {
            "components_gb": rows,
            "registered_total_gb": round(total / 1e9, 3),
            "hbm_in_use_gb": round(stats.get("bytes_in_use", 0) / 1e9, 3),
            "hbm_limit_gb": round(stats.get("bytes_limit", 0) / 1e9, 3),
        }
        log("HBM budget: %s", json.dumps(out))
        return out
