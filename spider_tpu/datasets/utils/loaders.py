"""Loader utilities — TPU-native rework of
/root/reference/spider/datasets/utils/dataloader_utils.py:18-181 and
data_utils.py:25-88:

  * MultiIterLoader: ratio-weighted mixing of multiple sources. The reference
    broadcasts rank-0's random choice over NCCL every step
    (dataloader_utils.py:45-62); here every process draws from the SAME
    seeded RNG stream, so no collective is needed and the choice is
    reproducible.
  * IterLoader: epoch-aware infinite iterator.
  * PrefetchLoader: background-thread host->device prefetch (the CUDA-stream
    analogue, dataloader_utils.py:65-130) via jax.device_put.
  * ChainDataset / prepare_sample: sample-ratio chaining + device transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np


class MultiIterLoader:
    """Draw each batch from one of `loaders`, picked with probability
    proportional to `ratios` from a deterministic shared RNG."""

    def __init__(self, loaders: Sequence[Iterable],
                 ratios: Optional[Sequence[float]] = None, seed: int = 42):
        assert loaders
        if ratios is None:
            ratios = [1.0] * len(loaders)
        ratios = np.asarray(ratios, np.float64)
        self._p = ratios / ratios.sum()
        self._iters = [iter(l) for l in loaders]
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self):
        idx = int(self._rng.choice(len(self._iters), p=self._p))
        return next(self._iters[idx])


class IterLoader:
    """Infinite iterator with epoch tracking (dataloader_utils.py:146-181)."""

    def __init__(self, loader: Iterable, use_distributed: bool = False):
        self._loader = loader
        self._epoch = 0
        self._iter = iter(loader)

    @property
    def epoch(self) -> int:
        return self._epoch

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._iter)
        except StopIteration:
            self._epoch += 1
            if hasattr(self._loader, "set_epoch"):
                self._loader.set_epoch(self._epoch)
            self._iter = iter(self._loader)
            return next(self._iter)


class PrefetchLoader:
    """Wraps an iterable; a worker thread stays `depth` batches ahead and
    moves arrays to device asynchronously."""

    _DONE = object()

    def __init__(self, loader: Iterable, depth: int = 2, device=None):
        self.loader = loader
        self.depth = depth
        self.device = device

    def _put(self, sample):
        def to_dev(v):
            if isinstance(v, np.ndarray) and v.dtype != object:
                return jax.device_put(v, self.device)
            return v

        return jax.tree_util.tree_map(to_dev, sample)

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def worker():
            try:
                for sample in self.loader:
                    q.put(self._put(sample))
            finally:
                q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._DONE:
                break
            yield item


class ChainDataset:
    """Chain iterable datasets with per-source sample ratios
    (data_utils.py:25-55)."""

    def __init__(self, datasets: Sequence[Iterable],
                 ratios: Optional[Sequence[float]] = None, seed: int = 0):
        self.loader = MultiIterLoader(datasets, ratios, seed)

    def __iter__(self):
        return iter(self.loader)


def collate_samples(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List of sample dicts -> batch dict (default_collate analogue: arrays
    stack, scalars/strings become lists)."""
    assert samples
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = [np.asarray(v) for v in vals]
        else:
            out[key] = vals
    return out


def batched(loader: Iterable[Dict], batch_size: int) -> Iterator[Dict]:
    buf: List[Dict] = []
    for sample in loader:
        buf.append(sample)
        if len(buf) == batch_size:
            yield collate_samples(buf)
            buf = []


def prepare_sample(sample: Dict[str, Any], device=None) -> Dict[str, Any]:
    """Move array leaves to device (move_to_cuda analogue,
    data_utils.py:82-88)."""

    def to_dev(v):
        if isinstance(v, np.ndarray) and v.dtype != object:
            return jax.device_put(v, device)
        return v

    return jax.tree_util.tree_map(to_dev, sample)
