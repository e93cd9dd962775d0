"""Distributed runtime bootstrap — the TPU-native replacement for the
reference's NCCL plumbing (cf. /root/reference/spider/common/dist_utils.py).

Instead of torch.distributed process groups, we have:
  * ``jax.distributed.initialize()`` for multi-host rendezvous (auto on TPU pods)
  * a named :class:`jax.sharding.Mesh` with axes ``(data, fsdp, model, expert)``
    over which all parallelism is expressed via shardings + collectives
  * process-0 helpers for logging / io.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False

# Canonical mesh axis names. data = pure data parallel (DCN-friendly),
# fsdp = param/optimizer sharding axis (ZeRO analogue), model = tensor parallel,
# expert = MoE expert parallel. A separate `context` axis can be requested for
# ring attention.
AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_MODEL = "model"
AXIS_EXPERT = "expert"
AXIS_CONTEXT = "context"


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. Safe to call multiple times / single-host.

    Mirrors the role of the reference's ``init_distributed_mode``
    (/root/reference/spider/common/dist_utils.py:57-93) but with JAX's
    single-call rendezvous instead of env/SLURM NCCL setup.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    want_multihost = (
        coordinator_address is not None
        or "COORDINATOR_ADDRESS" in os.environ
        or int(os.environ.get("SPIDER_TPU_NUM_PROCESSES", "1")) > 1
    )
    if want_multihost:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _INITIALIZED = True
    setup_for_distributed(is_main_process())


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_process(func):
    """Decorator: run only on process 0 (cf. dist_utils.py:110)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def setup_for_distributed(is_master: bool) -> None:
    """Suppress logging noise on non-zero processes
    (cf. dist_utils.py:17-30, which monkey-patched print)."""
    if not is_master:
        logging.getLogger().setLevel(logging.WARNING)


def _factorize(n: int, shape: Sequence[Optional[int]]) -> Tuple[int, ...]:
    """Fill at most one -1/None entry of `shape` so the product equals n."""
    known = 1
    free = None
    out = list(shape)
    for i, s in enumerate(out):
        if s in (None, -1):
            if free is not None:
                raise ValueError("at most one mesh axis may be -1")
            free = i
        else:
            known *= s
    if free is not None:
        if n % known:
            raise ValueError(f"cannot factor {n} devices into {shape}")
        out[free] = n // known
        known = n
    if known != n:
        raise ValueError(f"mesh shape {out} != device count {n}")
    return tuple(out)


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    model: int = 1,
    expert: int = 1,
    context: int = 1,
    *,
    devices=None,
    extra_axes: Sequence[str] = (),
) -> Mesh:
    """Create the global device mesh.

    Axis order is (data, fsdp, model, expert, context[, extra...]) — data
    outermost so DCN slices map to pure data parallelism while
    fsdp/model/expert/context ride ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [AXIS_DATA, AXIS_FSDP, AXIS_MODEL, AXIS_EXPERT, AXIS_CONTEXT] \
        + list(extra_axes)
    sizes = [data, fsdp, model, expert, context] + [1] * len(extra_axes)
    shape = _factorize(len(devices), sizes)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, tuple(names))


def default_mesh() -> Mesh:
    """All devices on the data axis (pure DP)."""
    return make_mesh(data=None)
